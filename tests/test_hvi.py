"""HVI color transform: round-trip, gates, gradient semantics, torch parity."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hvi_cidnet_tpu.ops.hvi import rgb_to_hvi, hvi_to_rgb, hvi_roundtrip


def _rand_img(shape=(2, 16, 16, 3), seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.uniform(0, 1, shape).astype(np.float32))


def test_roundtrip_recovers_rgb():
    img = _rand_img()
    out = hvi_roundtrip(img, jnp.asarray(0.2))
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=2e-3)


def test_hvi_intensity_is_max_channel():
    img = _rand_img()
    hvi = rgb_to_hvi(img, jnp.asarray(0.2))
    np.testing.assert_allclose(
        np.asarray(hvi[..., 2]), np.asarray(jnp.max(img, axis=-1)), atol=1e-7
    )


def test_gray_pixels_have_zero_chroma():
    gray = jnp.broadcast_to(jnp.linspace(0, 1, 8).reshape(1, 8, 1, 1), (1, 8, 4, 3))
    hvi = rgb_to_hvi(gray, jnp.asarray(0.2))
    np.testing.assert_allclose(np.asarray(hvi[..., :2]), 0.0, atol=1e-6)


def test_gates_match_formula():
    img = _rand_img(seed=3)
    hvi = rgb_to_hvi(img, jnp.asarray(0.2))
    base = hvi_to_rgb(hvi, jnp.asarray(0.2))
    gated2 = hvi_to_rgb(hvi, jnp.asarray(0.2), gated2=True, alpha=0.8)
    np.testing.assert_allclose(np.asarray(gated2), np.asarray(base) * 0.8, rtol=1e-6)
    # alpha_s scales saturation before clamping; just check it changes output
    gated = hvi_to_rgb(hvi, jnp.asarray(0.2), gated=True, alpha_s=1.3)
    assert not np.allclose(np.asarray(gated), np.asarray(base))


def test_k_gradient_only_through_forward_transform():
    """PHVIT used the detached this_k scalar (HVI_transform.py:38,59)."""
    img = _rand_img(seed=4)

    def loss(k):
        return jnp.sum(hvi_roundtrip(img, k) ** 2)

    g = jax.grad(loss)(jnp.asarray(0.2))
    assert np.isfinite(float(g))

    def loss_inv_only(k):
        hvi = rgb_to_hvi(img, jax.lax.stop_gradient(jnp.asarray(0.2)))
        return jnp.sum(hvi_to_rgb(hvi, jax.lax.stop_gradient(k)) ** 2)

    g2 = jax.grad(loss_inv_only)(jnp.asarray(0.2))
    assert float(g2) == 0.0


@pytest.mark.parametrize("gates", [{}, {"gated": True, "alpha_s": 1.3}, {"gated2": True, "alpha": 0.84}])
def test_torch_parity(torch_reference_path, gates):
    import torch
    from net.HVI_transform import RGB_HVI

    rng = np.random.default_rng(7)
    img = rng.uniform(0, 1, (2, 3, 17, 23)).astype(np.float32)  # NCHW, odd sizes
    ref = RGB_HVI()
    ref.gated = gates.get("gated", False)
    ref.gated2 = gates.get("gated2", False)
    ref.alpha = gates.get("alpha", 1.0)
    ref.alpha_s = gates.get("alpha_s", 1.3)
    with torch.no_grad():
        t_hvi = ref.HVIT(torch.from_numpy(img))
        t_rgb = ref.PHVIT(t_hvi)

    j_img = jnp.asarray(img.transpose(0, 2, 3, 1))
    j_hvi = rgb_to_hvi(j_img, jnp.asarray(0.2))
    j_rgb = hvi_to_rgb(j_hvi, jnp.asarray(0.2), **gates)

    np.testing.assert_allclose(
        np.asarray(j_hvi).transpose(0, 3, 1, 2), t_hvi.numpy(), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(j_rgb).transpose(0, 3, 1, 2), t_rgb.numpy(), atol=1e-5
    )
