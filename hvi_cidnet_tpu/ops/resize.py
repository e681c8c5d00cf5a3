"""Bilinear resize with exact PyTorch semantics, expressed as matmuls.

The reference uses two bilinear flavors:

* ``nn.UpsamplingBilinear2d(scale_factor=s)`` == ``F.interpolate(...,
  mode='bilinear', align_corners=True)`` for the UNet down/upsampling
  (``net/transformer_utils.py:38-40,57-59``).
* ``F.interpolate(..., mode='bilinear', align_corners=False)`` for TNSM
  noise-map resizing (``net/CIDNet_TNSM.py:258``).

``jax.image.resize`` implements neither exactly, and bit-parity with released
checkpoints demands exactness.  Separable bilinear interpolation is a pair of
small dense matrices applied along H then W — which XLA maps straight onto the
MXU, making this *faster* than a gather-based resize on TPU.  The matrices are
built in numpy at trace time (static shapes) and become compile-time
constants.
"""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp


@functools.lru_cache(maxsize=None)
def _interp_matrix(in_size: int, out_size: int, align_corners: bool) -> np.ndarray:
    """(out_size, in_size) row-stochastic bilinear interpolation matrix."""
    m = np.zeros((out_size, in_size), dtype=np.float32)
    if in_size == 1:
        m[:, 0] = 1.0
        return m
    for i in range(out_size):
        if align_corners:
            src = i * (in_size - 1) / (out_size - 1) if out_size > 1 else 0.0
        else:
            # torch half-pixel convention, clamped to >= 0
            src = max((i + 0.5) * in_size / out_size - 0.5, 0.0)
        lo = min(int(np.floor(src)), in_size - 1)
        hi = min(lo + 1, in_size - 1)
        frac = src - lo
        m[i, lo] += 1.0 - frac
        m[i, hi] += frac
    return m


def resize_bilinear(
    x: jnp.ndarray,
    out_h: int,
    out_w: int,
    *,
    align_corners: bool,
) -> jnp.ndarray:
    """Bilinear-resize NHWC ``x`` to (out_h, out_w), torch bit-semantics.

    Interpolation runs in the input dtype (torch computes in the tensor's
    dtype too); the two contractions hit the MXU.
    """
    _, h, w, _ = x.shape
    if h == out_h and w == out_w:
        return x
    dt = x.dtype
    mh = jnp.asarray(_interp_matrix(h, out_h, align_corners), dt)
    mw = jnp.asarray(_interp_matrix(w, out_w, align_corners), dt)
    # (B,H,W,C) -> (B,out_h,W,C): contract H with mh.
    x = jnp.einsum("oh,bhwc->bowc", mh, x, preferred_element_type=jnp.float32)
    x = jnp.einsum("pw,bhwc->bhpc", mw, x.astype(dt), preferred_element_type=jnp.float32)
    return x.astype(dt)


def scale_half(x: jnp.ndarray) -> jnp.ndarray:
    """``UpsamplingBilinear2d(scale_factor=0.5)`` (transformer_utils.py:40)."""
    _, h, w, _ = x.shape
    return resize_bilinear(x, h // 2, w // 2, align_corners=True)


def scale_double(x: jnp.ndarray) -> jnp.ndarray:
    """``UpsamplingBilinear2d(scale_factor=2)`` (transformer_utils.py:59)."""
    _, h, w, _ = x.shape
    return resize_bilinear(x, h * 2, w * 2, align_corners=True)
