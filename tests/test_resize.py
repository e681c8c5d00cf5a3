"""Bilinear resize parity vs torch (both UNet fast paths and generic path)."""

import numpy as np
import jax.numpy as jnp
import pytest

from hvi_cidnet_tpu.ops.resize import resize_bilinear, scale_double, scale_half


def _torch_resize(x_nhwc, out_h, out_w, align_corners):
    import torch
    import torch.nn.functional as F

    t = torch.from_numpy(np.asarray(x_nhwc, np.float32).transpose(0, 3, 1, 2))
    out = F.interpolate(t, size=(out_h, out_w), mode="bilinear", align_corners=align_corners)
    return out.numpy().transpose(0, 2, 3, 1)


@pytest.mark.parametrize("hw", [(16, 24), (50, 76), (14, 10)])
def test_scale_half_matches_torch(torch_reference_path, hw):
    h, w = hw
    x = np.random.default_rng(0).uniform(0, 1, (2, h, w, 5)).astype(np.float32)
    got = np.asarray(scale_half(jnp.asarray(x)))
    want = _torch_resize(x, h // 2, w // 2, True)
    np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.mark.parametrize("hw", [(8, 12), (25, 37), (7, 5)])
def test_scale_double_matches_torch(torch_reference_path, hw):
    h, w = hw
    x = np.random.default_rng(1).uniform(0, 1, (2, h, w, 5)).astype(np.float32)
    got = np.asarray(scale_double(jnp.asarray(x)))
    want = _torch_resize(x, h * 2, w * 2, True)
    np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.mark.parametrize("out", [(13, 21), (40, 40)])
def test_generic_resize_align_false_matches_torch(torch_reference_path, out):
    x = np.random.default_rng(2).uniform(0, 1, (1, 17, 29, 3)).astype(np.float32)
    got = np.asarray(resize_bilinear(jnp.asarray(x), out[0], out[1], align_corners=False))
    want = _torch_resize(x, out[0], out[1], False)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_fast_path_equals_matmul_path():
    """The banded slice+fma form must be numerically identical (fp32) to the
    dense interpolation matmul it replaces."""
    from hvi_cidnet_tpu.ops.resize import _interp_matrix

    x = np.random.default_rng(3).uniform(0, 1, (1, 20, 30, 4)).astype(np.float32)
    got = np.asarray(scale_half(jnp.asarray(x)))
    mh = _interp_matrix(20, 10, True)
    mw = _interp_matrix(30, 15, True)
    want = np.einsum("oh,bhwc->bowc", mh, x)
    want = np.einsum("pw,bhwc->bhpc", mw, want)
    np.testing.assert_allclose(got, want, atol=1e-5)
