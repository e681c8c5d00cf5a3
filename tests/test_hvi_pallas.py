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
