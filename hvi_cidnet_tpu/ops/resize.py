"""Bilinear resize with exact PyTorch semantics, TPU-layout aware.

The reference uses two bilinear flavors:

* ``nn.UpsamplingBilinear2d(scale_factor=s)`` == ``F.interpolate(...,
  mode='bilinear', align_corners=True)`` for the UNet down/upsampling
  (``net/transformer_utils.py:38-40,57-59``);
* ``F.interpolate(..., mode='bilinear', align_corners=False)`` for TNSM
  noise-map resizing (``net/CIDNet_TNSM.py:258``).

``jax.image.resize`` implements neither exactly, and parity with released
checkpoints demands exactness, so interpolation weights are derived from the
same (out, in) matrix torch uses and applied two ways, chosen by axis
position in the physical layout:

* **H axis (major)**: the x0.5 / x2 cases have banded structure — every
  output row's taps live in a fixed window of {2i, 2i+1, 2i+2} (down) or
  {j-1, j, j+1} (up) — evaluated with *reshape-based* even/odd splits + fma.
  No strided slices (they lower to gather loops on Mosaic) and no MXU FLOPs.
* **W axis (in or next to lanes)**: a dense interpolation matmul contracting
  the W dim — MXU-native, no layout copy; gathers measured far slower.

Entry points exist for the public NHWC layout and the model-internal NHCW
layout (see ops/conv.py).
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


def _band_weights(in_size: int, out_size: int, cols) -> list:
    """Read per-output weights at the given column patterns off the dense
    matrix, so the banded paths are *exactly* the matmul they replace."""
    m = _interp_matrix(in_size, out_size, True)
    out = []
    for col_fn in cols:
        w = np.zeros(out_size, np.float32)
        for i in range(out_size):
            c = col_fn(i)
            if c is not None and 0 <= c < in_size:
                w[i] = m[i, c]
        out.append(w)
    return out


def _wshape(ndim: int, axis: int, size: int):
    s = [1] * ndim
    s[axis] = size
    return s


def _half_major(x: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Exact align_corners x0.5 along a major axis via even/odd reshape."""
    h = x.shape[axis]
    oh = h // 2
    a, b, c = _band_weights(h, oh, [lambda i: 2 * i, lambda i: 2 * i + 1, lambda i: 2 * i + 2])
    dt = x.dtype
    shp = list(x.shape)
    shp[axis : axis + 1] = [oh, 2]
    pairs = x.reshape(shp)  # (..., oh, 2, ...)
    idx_even = [slice(None)] * pairs.ndim
    idx_even[axis + 1] = 0
    idx_odd = [slice(None)] * pairs.ndim
    idx_odd[axis + 1] = 1
    even = pairs[tuple(idx_even)]
    odd = pairs[tuple(idx_odd)]
    # rows 2i+2 == even rows shifted up one; last weight is 0 by construction
    roll = [slice(None)] * even.ndim
    roll[axis] = slice(1, None)
    pad = [(0, 0)] * even.ndim
    pad[axis] = (0, 1)
    nxt = jnp.pad(even[tuple(roll)], pad)
    aw = jnp.asarray(a, dt).reshape(_wshape(even.ndim, axis, oh))
    bw = jnp.asarray(b, dt).reshape(_wshape(even.ndim, axis, oh))
    cw = jnp.asarray(c, dt).reshape(_wshape(even.ndim, axis, oh))
    return even * aw + odd * bw + nxt * cw


def _double_major(x: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Exact align_corners x2 along a major axis: shifted fmas, interleaved
    back with a free reshape."""
    h = x.shape[axis]
    oh = 2 * h
    ae_f, be_f = _band_weights(h, oh, [lambda i: i // 2 - 1, lambda i: i // 2])
    ao_f, bo_f = _band_weights(h, oh, [lambda i: i // 2, lambda i: i // 2 + 1])
    ae, be = ae_f[0::2], be_f[0::2]
    ao, bo = ao_f[1::2], bo_f[1::2]
    dt = x.dtype

    def shift(delta):
        s = [slice(None)] * x.ndim
        pad = [(0, 0)] * x.ndim
        if delta == -1:
            s[axis] = slice(0, h - 1)
            pad[axis] = (1, 0)
        else:
            s[axis] = slice(1, h)
            pad[axis] = (0, 1)
        return jnp.pad(x[tuple(s)], pad)

    sh = _wshape(x.ndim, axis, h)
    out_even = shift(-1) * jnp.asarray(ae, dt).reshape(sh) + x * jnp.asarray(be, dt).reshape(sh)
    out_odd = x * jnp.asarray(ao, dt).reshape(sh) + shift(1) * jnp.asarray(bo, dt).reshape(sh)
    stacked = jnp.stack([out_even, out_odd], axis=axis + 1)
    new_shape = list(x.shape)
    new_shape[axis] = oh
    return stacked.reshape(new_shape)


# ---------------------------------------------------------------------------
# HWCB (model-internal) entry points — H and W are both MAJOR axes (0, 1), so
# the x0.5/x2 cases use the banded shift-fma forms on each axis and the
# arbitrary-ratio case contracts a major axis with the dense matrix.
# ---------------------------------------------------------------------------


def _axis_matmul_major(x: jnp.ndarray, axis: int, out_size: int, align_corners: bool) -> jnp.ndarray:
    m = jnp.asarray(_interp_matrix(x.shape[axis], out_size, align_corners), x.dtype)
    moved = jnp.moveaxis(x, axis, 0)
    flat = moved.reshape(moved.shape[0], -1)
    out = jnp.einsum("oh,hm->om", m, flat).reshape((out_size,) + moved.shape[1:])
    return jnp.moveaxis(out, 0, axis)


def scale_half_hwcb(x: jnp.ndarray) -> jnp.ndarray:
    """``UpsamplingBilinear2d(0.5)`` on HWCB (transformer_utils.py:40)."""
    return _half_major(_half_major(x, 0), 1)


def scale_double_hwcb(x: jnp.ndarray) -> jnp.ndarray:
    """``UpsamplingBilinear2d(2)`` on HWCB (transformer_utils.py:59)."""
    return _double_major(_double_major(x, 0), 1)


def resize_bilinear_hwcb(x: jnp.ndarray, out_h: int, out_w: int, *, align_corners: bool) -> jnp.ndarray:
    """Arbitrary-ratio resize on HWCB (TNSM noise maps, CIDNet_TNSM.py:258)."""
    if x.shape[0] != out_h:
        x = _axis_matmul_major(x, 0, out_h, align_corners)
    if x.shape[1] != out_w:
        x = _axis_matmul_major(x, 1, out_w, align_corners)
    return x


# ---------------------------------------------------------------------------
# NHWC (public) entry points
# ---------------------------------------------------------------------------


def _w_matmul_nhwc(x: jnp.ndarray, out_w: int, align_corners: bool) -> jnp.ndarray:
    b, h, w, c = x.shape
    mw = jnp.asarray(_interp_matrix(w, out_w, align_corners), x.dtype)
    return jnp.einsum("pw,awc->apc", mw, x.reshape(b * h, w, c)).reshape(b, h, out_w, c)


def resize_bilinear(x: jnp.ndarray, out_h: int, out_w: int, *, align_corners: bool) -> jnp.ndarray:
    """Bilinear-resize NHWC ``x`` to (out_h, out_w), torch bit-semantics."""
    b, h, w, c = x.shape
    if h != out_h:
        if align_corners and out_h == h // 2 and h % 2 == 0:
            x = _half_major(x, 1)
        elif align_corners and out_h == 2 * h:
            x = _double_major(x, 1)
        else:
            mh = jnp.asarray(_interp_matrix(h, out_h, align_corners), x.dtype)
            x = jnp.einsum("oh,bhm->bom", mh, x.reshape(b, h, w * c)).reshape(b, out_h, w, c)
    if w != out_w:
        x = _w_matmul_nhwc(x, out_w, align_corners)
    return x


def scale_half(x: jnp.ndarray) -> jnp.ndarray:
    """``UpsamplingBilinear2d(scale_factor=0.5)`` on NHWC."""
    _, h, w, _ = x.shape
    return resize_bilinear(x, h // 2, w // 2, align_corners=True)


def scale_double(x: jnp.ndarray) -> jnp.ndarray:
    """``UpsamplingBilinear2d(scale_factor=2)`` on NHWC."""
    _, h, w, _ = x.shape
    return resize_bilinear(x, h * 2, w * 2, align_corners=True)
