"""Pallas HVI kernel parity (interpreter mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hvi_cidnet_tpu.ops.hvi import rgb_to_hvi, hvi_to_rgb
from hvi_cidnet_tpu.ops.hvi_pallas import (
    hvi_to_rgb_pallas,
    rgb_to_hvi_pallas,
    should_use_pallas,
)


def _img(shape=(2, 17, 23, 3), seed=0):
    return jnp.asarray(
        np.random.default_rng(seed).uniform(0, 1, shape).astype(np.float32)
    )


def test_forward_matches_pure():
    img = _img()
    ref = rgb_to_hvi(img, jnp.asarray(0.2))
    got = rgb_to_hvi_pallas(img, 0.2, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-6)


@pytest.mark.parametrize(
    "gates", [{}, {"gated": True, "alpha_s": 1.3}, {"gated2": True, "alpha": 0.84}]
)
def test_inverse_matches_pure(gates):
    hvi = rgb_to_hvi(_img(seed=1), jnp.asarray(0.2))
    ref = hvi_to_rgb(hvi, jnp.asarray(0.2), **gates)
    got = hvi_to_rgb_pallas(hvi, 0.2, interpret=True, **gates)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-6)


def test_gradients_route_through_pure_vjp():
    img = _img(seed=2)
    g_pal = jax.grad(lambda k: jnp.sum(rgb_to_hvi_pallas(img, k, interpret=True) ** 2))(
        jnp.asarray(0.2)
    )
    g_ref = jax.grad(lambda k: jnp.sum(rgb_to_hvi(img, k) ** 2))(jnp.asarray(0.2))
    assert float(g_pal) == pytest.approx(float(g_ref), rel=1e-6)


def test_kernel_never_selected_on_cpu(monkeypatch):
    # default-on applies to TPU backends only; CPU always takes the jnp path
    monkeypatch.delenv("HVI_USE_PALLAS", raising=False)
    assert should_use_pallas() is False
    monkeypatch.setenv("HVI_USE_PALLAS", "0")
    assert should_use_pallas() is False


def test_hwcb_forward_matches_pure():
    """HWCB-native wrapper: NHWC in, HWCB out, same values (round-3 #7)."""
    from hvi_cidnet_tpu.ops.hvi_pallas import rgb_to_hvi_pallas_hwcb

    img = _img(seed=5)
    ref = jnp.transpose(rgb_to_hvi(img, jnp.asarray(0.2)), (1, 2, 3, 0))
    got = rgb_to_hvi_pallas_hwcb(img, 0.2, interpret=True)
    assert got.shape == ref.shape  # (H, W, 3, B)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-6)


@pytest.mark.parametrize(
    "gates", [{}, {"gated": True, "alpha_s": 1.3}, {"gated2": True, "alpha": 0.84}]
)
def test_hwcb_inverse_matches_pure(gates):
    from hvi_cidnet_tpu.ops.hvi_pallas import hvi_to_rgb_pallas_hwcb

    img = _img(seed=6)
    hvi = rgb_to_hvi(img, jnp.asarray(0.2))
    hvi_hwcb = jnp.transpose(hvi, (1, 2, 3, 0))
    ref = hvi_to_rgb(hvi, jnp.asarray(0.2), **gates)
    got = hvi_to_rgb_pallas_hwcb(hvi_hwcb, 0.2, interpret=True, **gates)
    assert got.shape == ref.shape  # NHWC
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=3e-6)


def test_hwcb_gradients_route_through_pure_vjp():
    from hvi_cidnet_tpu.ops.hvi_pallas import rgb_to_hvi_pallas_hwcb

    img = _img(shape=(1, 9, 11, 3), seed=7)
    k = jnp.asarray(0.2)

    def f_pallas(img, k):
        return jnp.sum(rgb_to_hvi_pallas_hwcb(img, k, interpret=True) ** 2)

    def f_pure(img, k):
        return jnp.sum(jnp.transpose(rgb_to_hvi(img, k), (1, 2, 3, 0)) ** 2)

    g1 = jax.grad(f_pallas, argnums=(0, 1))(img, k)
    g2 = jax.grad(f_pure, argnums=(0, 1))(img, k)
    np.testing.assert_allclose(np.asarray(g1[0]), np.asarray(g2[0]), atol=1e-5)
    np.testing.assert_allclose(float(g1[1]), float(g2[1]), atol=1e-5)


def test_hwcb_wrappers_hwb_order_parity():
    """HVI_HWB_ORDER repacks planes in HWB pixel order (one lane crossing
    instead of two); the transform is pointwise so values must be identical
    to the BHW-order arm on both wrappers."""
    from hvi_cidnet_tpu.ops.hvi_pallas import (
        hvi_to_rgb_pallas_hwcb,
        rgb_to_hvi_pallas_hwcb,
    )
    from hvi_cidnet_tpu.ops.pallas_gate import kernel_flags

    img = _img(seed=8)
    with kernel_flags(hvi_hwb_order=False):
        fwd_ref = rgb_to_hvi_pallas_hwcb(img, 0.2, interpret=True)
        inv_ref = hvi_to_rgb_pallas_hwcb(fwd_ref, 0.2, interpret=True, gated2=True, alpha=0.84)
    with kernel_flags(hvi_hwb_order=True):
        fwd = rgb_to_hvi_pallas_hwcb(img, 0.2, interpret=True)
        inv = hvi_to_rgb_pallas_hwcb(fwd, 0.2, interpret=True, gated2=True, alpha=0.84)
    np.testing.assert_array_equal(np.asarray(fwd), np.asarray(fwd_ref))
    np.testing.assert_array_equal(np.asarray(inv), np.asarray(inv_ref))


def test_hwcb_io_forward_matches_pure():
    """HWCB-in/HWCB-out wrapper (the hwcb serving contract): zero
    lane-crossing transposes, same values as the channel_axis=2 XLA path."""
    from hvi_cidnet_tpu.ops.hvi_pallas import rgb_to_hvi_pallas_hwcb_io

    img = jnp.transpose(_img(seed=9), (1, 2, 3, 0))  # (H, W, 3, B)
    ref = rgb_to_hvi(img, jnp.asarray(0.2), channel_axis=2)
    got = rgb_to_hvi_pallas_hwcb_io(img, 0.2, interpret=True)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-6)


@pytest.mark.parametrize(
    "gates", [{}, {"gated": True, "alpha_s": 1.3}, {"gated2": True, "alpha": 0.84}]
)
def test_hwcb_io_inverse_matches_pure(gates):
    from hvi_cidnet_tpu.ops.hvi_pallas import hvi_to_rgb_pallas_hwcb_io

    img = jnp.transpose(_img(seed=10), (1, 2, 3, 0))
    hvi = rgb_to_hvi(img, jnp.asarray(0.2), channel_axis=2)
    ref = hvi_to_rgb(hvi, jnp.asarray(0.2), channel_axis=2, **gates)
    got = hvi_to_rgb_pallas_hwcb_io(hvi, 0.2, interpret=True, **gates)
    assert got.shape == ref.shape  # (H, W, 3, B)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=3e-6)


def test_hwcb_io_gradients_route_through_pure_vjp():
    from hvi_cidnet_tpu.ops.hvi_pallas import rgb_to_hvi_pallas_hwcb_io

    img = jnp.transpose(_img(shape=(1, 9, 11, 3), seed=11), (1, 2, 3, 0))
    k = jnp.asarray(0.2)

    def f_pallas(img, k):
        return jnp.sum(rgb_to_hvi_pallas_hwcb_io(img, k, interpret=True) ** 2)

    def f_pure(img, k):
        return jnp.sum(rgb_to_hvi(img, k, channel_axis=2) ** 2)

    g1 = jax.grad(f_pallas, argnums=(0, 1))(img, k)
    g2 = jax.grad(f_pure, argnums=(0, 1))(img, k)
    np.testing.assert_allclose(np.asarray(g1[0]), np.asarray(g2[0]), atol=1e-5)
    np.testing.assert_allclose(float(g1[1]), float(g2[1]), atol=1e-5)
