"""Fused Pallas TPU kernels for the HVI color transform.

One kernel launch per direction computes the whole transform (channel-max
masks, trig, pow) in VMEM over planar (rows, 128) tiles — the fused-kernel
form of ``ops/hvi.py`` (reference semantics: net/HVI_transform.py:16-122).

Layout: the NHWC C=3 minor axis is hostile to 128-lane tiling, so the
wrappers move channels major (one small transpose each way) and pad the
pixel count to a whole number of (8, 128) fp32 tiles.  Gradients route
through ``jax.custom_vjp`` using the pure-jnp twin's VJP — bitwise-identical
math, so forward speed comes from Pallas while autodiff stays exact.

Status (measured on the v5e tunnel): standalone, the planar packing's two
small transposes leave the kernel at 11.4 ms round-trip vs 8.2 ms for XLA's
fusion of the pure-jnp twin — but **in the full CIDNet graph the difference
vanishes** (162.7 vs 162.4 img/s at 600x400 batch 128; the packing overlaps
with neighboring work), so the model runs the fused kernels by default on
TPU.  ``HVI_USE_PALLAS=0`` opts out.  A layout-native variant (strided lane
deinterleave) does not yet compile on this Mosaic version; revisit.
Tests exercise the kernel in interpreter mode on CPU.
"""

from __future__ import annotations

import functools
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hvi_cidnet_tpu.ops import hvi as _ref
from hvi_cidnet_tpu.ops.pallas_gate import backend_ok, force_interpret, kernel_flag, pallas_allowed

PI = _ref.PI
_EPS = 1e-8
_LANES = 128
_ROWS = 256  # rows per grid step: 256x128 fp32 tile = 128 KB/plane in VMEM


def should_use_pallas() -> bool:
    """Default-on for TPU backends (or forced interpret mode);
    HVI_USE_PALLAS=0 opts out.  SPMD safety is structural — see
    ops/pallas_gate.py."""
    if not kernel_flag("hvi_pallas"):
        return False
    return pallas_allowed() and backend_ok()


# ---------------------------------------------------------------------------
# Kernels (operate on (ROWS, 128) fp32 planes)
# ---------------------------------------------------------------------------


def _hvit_kernel(k_ref, r_ref, g_ref, b_ref, h_ref, v_ref, i_ref):
    r = r_ref[0]  # input blocks are (1, ROWS, LANES); outputs (ROWS, LANES)
    g = g_ref[0]
    b = b_ref[0]
    value = jnp.maximum(jnp.maximum(r, g), b)
    vmin = jnp.minimum(jnp.minimum(r, g), b)
    denom = value - vmin + _EPS

    hue = jnp.where(b == value, 4.0 + (r - g) / denom, 0.0)
    hue = jnp.where(g == value, 2.0 + (b - r) / denom, hue)
    hue = jnp.where(r == value, jnp.mod((g - b) / denom, 6.0), hue)
    hue = jnp.where(vmin == value, 0.0, hue)
    hue = hue * (1.0 / 6.0)

    sat = jnp.where(value == 0, 0.0, (value - vmin) / (value + _EPS))

    k = k_ref[0]
    cs = jnp.exp(k * jnp.log(jnp.sin(value * (0.5 * PI)) + _EPS))
    h_ref[:] = cs * sat * jnp.cos(2.0 * PI * hue)
    v_ref[:] = cs * sat * jnp.sin(2.0 * PI * hue)
    i_ref[:] = value


def _atan(z: jnp.ndarray) -> jnp.ndarray:
    """fp32 arctan via Cephes-style range reduction + degree-4 minimax poly
    (max err ~1e-7 rad).  Mosaic has no atan/atan2 primitive."""
    az = jnp.abs(z)
    big = az > 2.414213562373095  # tan(3pi/8)
    mid = jnp.logical_and(az > 0.4142135623730950, jnp.logical_not(big))  # tan(pi/8)
    x = jnp.where(big, -1.0 / az, jnp.where(mid, (az - 1.0) / (az + 1.0), az))
    base = jnp.where(big, 0.5 * PI, jnp.where(mid, 0.25 * PI, 0.0))
    zz = x * x
    poly = (
        ((8.05374449538e-2 * zz - 1.38776856032e-1) * zz + 1.99777106478e-1) * zz
        - 3.33329491539e-1
    ) * zz * x + x
    return jnp.sign(z) * (base + poly)


def _atan2(y: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    r = _atan(y / x)
    out = jnp.where(x > 0, r, jnp.where(y >= 0, r + PI, r - PI))
    return jnp.where(x == 0, jnp.sign(y) * (0.5 * PI), out)


def _phvit_kernel(k_ref, h_ref, v_ref, i_ref, r_ref, g_ref, b_ref, *, gated, gated2, alpha, alpha_s):
    hc = jnp.clip(h_ref[0], -1.0, 1.0)  # input blocks are (1, ROWS, LANES)
    vc = jnp.clip(v_ref[0], -1.0, 1.0)
    ic = jnp.clip(i_ref[0], 0.0, 1.0)

    k = k_ref[0]
    cs = jnp.exp(k * jnp.log(jnp.sin(ic * (0.5 * PI)) + _EPS))
    hc = jnp.clip(hc / (cs + _EPS), -1.0, 1.0)
    vc = jnp.clip(vc / (cs + _EPS), -1.0, 1.0)

    h = jnp.mod(_atan2(vc + _EPS, hc + _EPS) * (1.0 / (2.0 * PI)), 1.0)
    s = jnp.sqrt(hc * hc + vc * vc + _EPS)
    if gated:
        s = s * alpha_s
    s = jnp.clip(s, 0.0, 1.0)
    v = jnp.clip(ic, 0.0, 1.0)

    hi = jnp.floor(h * 6.0)
    f = h * 6.0 - hi
    p = v * (1.0 - s)
    q = v * (1.0 - f * s)
    t = v * (1.0 - (1.0 - f) * s)

    zero = jnp.zeros_like(h)
    r = zero
    g = zero
    b = zero
    for sector, (rr, gg, bb) in enumerate(
        [(v, t, p), (q, v, p), (p, v, t), (p, q, v), (t, p, v), (v, p, q)]
    ):
        m = hi == sector
        r = jnp.where(m, rr, r)
        g = jnp.where(m, gg, g)
        b = jnp.where(m, bb, b)
    if gated2:
        r = r * alpha
        g = g * alpha
        b = b * alpha
    r_ref[:] = r
    g_ref[:] = g
    b_ref[:] = b


# ---------------------------------------------------------------------------
# Plane packing
# ---------------------------------------------------------------------------


def _to_planes(img: jnp.ndarray):
    """(..., 3) -> three (M, 128) fp32 planes + shape info."""
    shape = img.shape
    n = int(np.prod(shape[:-1]))
    rows = pl.cdiv(n, _LANES)
    rows_pad = pl.cdiv(rows, _ROWS) * _ROWS
    flat = img.reshape(n, 3).astype(jnp.float32)
    planes = jnp.transpose(flat, (1, 0))  # (3, n) — the only transpose
    pad = rows_pad * _LANES - n
    planes = jnp.pad(planes, ((0, 0), (0, pad)))
    return planes.reshape(3, rows_pad, _LANES), shape, n


def _from_planes(planes: jnp.ndarray, shape, n: int, dtype):
    out = planes.reshape(3, -1)[:, :n]
    return jnp.transpose(out, (1, 0)).reshape(shape).astype(dtype)


def _run(kernel, planes, k, n_out=3, interpret=False):
    _, rows_pad, _ = planes.shape
    grid = (rows_pad // _ROWS,)
    # index maps receive (grid_idx, *scalar_prefetch_refs)
    spec = pl.BlockSpec((1, _ROWS, _LANES), lambda i, _k: (0, i, 0), memory_space=pltpu.VMEM)
    k_arr = jnp.asarray(k, jnp.float32).reshape(1)
    outs = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[spec, spec, spec],
            out_specs=[
                pl.BlockSpec((_ROWS, _LANES), lambda i, _k: (i, 0), memory_space=pltpu.VMEM)
            ] * n_out,
        ),
        out_shape=[jax.ShapeDtypeStruct((rows_pad, _LANES), jnp.float32)] * n_out,
        interpret=interpret,
    )(k_arr, planes[0:1], planes[1:2], planes[2:3])
    return jnp.stack(outs, axis=0)


# ---------------------------------------------------------------------------
# Public entry points with exact custom VJPs
# ---------------------------------------------------------------------------


def _rgb_to_hvi_fwd_impl(img, k, interpret):
    planes, shape, n = _to_planes(img)
    out = _run(_hvit_kernel, planes, k, interpret=interpret)
    return _from_planes(out, shape, n, img.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _rgb_to_hvi_p(img, k, interpret):
    return _rgb_to_hvi_fwd_impl(img, k, interpret)


def _rgb_fwd(img, k, interpret):
    return _rgb_to_hvi_fwd_impl(img, k, interpret), (img, k)


def _rgb_bwd(interpret, res, ct):
    img, k = res
    _, vjp = jax.vjp(_ref.rgb_to_hvi, img, k)
    return vjp(ct)


_rgb_to_hvi_p.defvjp(_rgb_fwd, _rgb_bwd)


def rgb_to_hvi_pallas(img: jnp.ndarray, k, *, interpret: Optional[bool] = None) -> jnp.ndarray:
    """Fused-kernel RGB->HVI (reference HVIT, HVI_transform.py:16-47)."""
    if interpret is None:
        interpret = force_interpret()
    return _rgb_to_hvi_p(img, jnp.asarray(k, jnp.float32).reshape(()), interpret)


def _hvi_to_rgb_fwd_impl(hvi, k, gates, interpret):
    gated, gated2, alpha, alpha_s = gates
    planes, shape, n = _to_planes(hvi)
    kern = functools.partial(
        _phvit_kernel, gated=gated, gated2=gated2, alpha=alpha, alpha_s=alpha_s
    )
    out = _run(kern, planes, k, interpret=interpret)
    return _from_planes(out, shape, n, hvi.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _hvi_to_rgb_p(hvi, k, gates, interpret):
    return _hvi_to_rgb_fwd_impl(hvi, k, gates, interpret)


def _inv_fwd(hvi, k, gates, interpret):
    return _hvi_to_rgb_fwd_impl(hvi, k, gates, interpret), (hvi, k)


def _inv_bwd(gates, interpret, res, ct):
    hvi, k = res
    gated, gated2, alpha, alpha_s = gates

    def pure(hvi, k):
        return _ref.hvi_to_rgb(hvi, k, gated=gated, gated2=gated2, alpha=alpha, alpha_s=alpha_s)

    _, vjp = jax.vjp(pure, hvi, k)
    return vjp(ct)


_hvi_to_rgb_p.defvjp(_inv_fwd, _inv_bwd)


def hvi_to_rgb_pallas(
    hvi: jnp.ndarray,
    k,
    *,
    gated: bool = False,
    gated2: bool = False,
    alpha: float = 1.0,
    alpha_s: float = 1.3,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Fused-kernel HVI->RGB (reference PHVIT, HVI_transform.py:49-122)."""
    if interpret is None:
        interpret = force_interpret()
    return _hvi_to_rgb_p(
        hvi,
        jnp.asarray(k, jnp.float32).reshape(()),
        (bool(gated), bool(gated2), float(alpha), float(alpha_s)),
        interpret,
    )


# ---------------------------------------------------------------------------
# HWCB-native wrappers (model-internal layout; round-3, VERDICT r2 #7)
#
# The transform is pointwise, so the plane packing only needs the SAME pixel
# bijection on all three channels — it does NOT need NHWC order.  Packing
# via (3, B, H, W) instead of (N, 3) avoids the 3-lane-wide transpose that
# made the planar packing cost ~1.5 GB/fwd, and emitting/consuming the
# model's HWCB layout directly deletes the NHWC boundary transposes around
# both transform sites (part of the 3.5 GB NHWC-boundary pool).
# ---------------------------------------------------------------------------


def _to_planes_bhw(x_3bhw: jnp.ndarray):
    """(3, B, H, W) f32 -> (3, rows_pad, 128) tiled planes + n."""
    n = int(np.prod(x_3bhw.shape[1:]))
    rows_pad = pl.cdiv(pl.cdiv(n, _LANES), _ROWS) * _ROWS
    flat = x_3bhw.reshape(3, n).astype(jnp.float32)
    flat = jnp.pad(flat, ((0, 0), (0, rows_pad * _LANES - n)))
    return flat.reshape(3, rows_pad, _LANES), n


def _rgb_to_hvi_hwcb_impl(img, k, interpret):
    b, h, w, _ = img.shape
    if kernel_flag("hvi_hwb_order"):
        # HWB pixel order inside the planes: the transform is pointwise, so
        # any pixel bijection works as long as pack and unpack agree.  BHW
        # order needs TWO lane-crossing transposes per transform (C-minor ->
        # W-minor on pack, W-minor -> B-minor on unpack); HWB order pays ONE
        # crossing on the NHWC side and the HWCB-side unpack is then a
        # major-dims-only move (B is already in lanes) — the 18 ms/fwd
        # dynamic-update-slice boundary pool halves (dus_hunt_r5.py).
        planes, n = _to_planes_bhw(jnp.transpose(img, (3, 1, 2, 0)))  # (3,H,W,B)
        out = _run(_hvit_kernel, planes, k, interpret=interpret)
        out = out.reshape(3, -1)[:, :n].reshape(3, h, w, b)
        return jnp.transpose(out, (1, 2, 0, 3)).astype(img.dtype)  # (H, W, 3, B)
    planes, n = _to_planes_bhw(jnp.transpose(img, (3, 0, 1, 2)))
    out = _run(_hvit_kernel, planes, k, interpret=interpret)
    out = out.reshape(3, -1)[:, :n].reshape(3, b, h, w)
    return jnp.transpose(out, (2, 3, 0, 1)).astype(img.dtype)  # (H, W, 3, B)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _rgb_to_hvi_hwcb_p(img, k, interpret):
    return _rgb_to_hvi_hwcb_impl(img, k, interpret)


def _rgb_hwcb_fwd(img, k, interpret):
    return _rgb_to_hvi_hwcb_impl(img, k, interpret), (img, k)


def _rgb_hwcb_bwd(interpret, res, ct):
    img, k = res

    def twin(img, k):
        return jnp.transpose(_ref.rgb_to_hvi(img, k), (1, 2, 3, 0))

    _, vjp = jax.vjp(twin, img, k)
    return vjp(ct)


_rgb_to_hvi_hwcb_p.defvjp(_rgb_hwcb_fwd, _rgb_hwcb_bwd)


def rgb_to_hvi_pallas_hwcb(img: jnp.ndarray, k, *, interpret: Optional[bool] = None) -> jnp.ndarray:
    """NHWC RGB -> HWCB HVI in one fused kernel + one layout transpose."""
    if interpret is None:
        interpret = force_interpret()
    return _rgb_to_hvi_hwcb_p(img, jnp.asarray(k, jnp.float32).reshape(()), interpret)


def _hvi_to_rgb_hwcb_impl(hvi_hwcb, k, gates, interpret):
    gated, gated2, alpha, alpha_s = gates
    h, w, _, b = hvi_hwcb.shape
    kern = functools.partial(
        _phvit_kernel, gated=gated, gated2=gated2, alpha=alpha, alpha_s=alpha_s
    )
    if kernel_flag("hvi_hwb_order"):
        # HWB pixel order: the HWCB-side pack is major-dims-only (B stays in
        # lanes); the single lane crossing moves to the NHWC output side
        planes, n = _to_planes_bhw(jnp.transpose(hvi_hwcb, (2, 0, 1, 3)))  # (3,H,W,B)
        out = _run(kern, planes, k, interpret=interpret)
        out = out.reshape(3, -1)[:, :n].reshape(3, h, w, b)
        return jnp.transpose(out, (3, 1, 2, 0)).astype(hvi_hwcb.dtype)  # NHWC
    planes, n = _to_planes_bhw(jnp.transpose(hvi_hwcb, (2, 3, 0, 1)))
    out = _run(kern, planes, k, interpret=interpret)
    out = out.reshape(3, -1)[:, :n].reshape(3, b, h, w)
    return jnp.transpose(out, (1, 2, 3, 0)).astype(hvi_hwcb.dtype)  # NHWC


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _hvi_to_rgb_hwcb_p(hvi, k, gates, interpret):
    return _hvi_to_rgb_hwcb_impl(hvi, k, gates, interpret)


def _inv_hwcb_fwd(hvi, k, gates, interpret):
    return _hvi_to_rgb_hwcb_impl(hvi, k, gates, interpret), (hvi, k)


def _inv_hwcb_bwd(gates, interpret, res, ct):
    hvi, k = res
    gated, gated2, alpha, alpha_s = gates

    def twin(hvi_hwcb, k):
        nhwc = jnp.transpose(hvi_hwcb, (3, 0, 1, 2))
        return _ref.hvi_to_rgb(nhwc, k, gated=gated, gated2=gated2, alpha=alpha, alpha_s=alpha_s)

    _, vjp = jax.vjp(twin, hvi, k)
    return vjp(ct)


_hvi_to_rgb_hwcb_p.defvjp(_inv_hwcb_fwd, _inv_hwcb_bwd)


def hvi_to_rgb_pallas_hwcb(
    hvi_hwcb: jnp.ndarray,
    k,
    *,
    gated: bool = False,
    gated2: bool = False,
    alpha: float = 1.0,
    alpha_s: float = 1.3,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """HWCB HVI -> NHWC RGB in one fused kernel + one layout transpose."""
    if interpret is None:
        interpret = force_interpret()
    return _hvi_to_rgb_hwcb_p(
        hvi_hwcb,
        jnp.asarray(k, jnp.float32).reshape(()),
        (bool(gated), bool(gated2), float(alpha), float(alpha_s)),
        interpret,
    )


# ---------------------------------------------------------------------------
# HWCB-in / HWCB-out wrappers (the hwcb serving contract, round 5)
#
# When BOTH sides are the model's internal (H,W,3,B) layout, HWB pixel
# order makes every pack/unpack a major-dims-only move (B never leaves the
# lane dim): the fused kernels run with ZERO lane-crossing transposes.
# Before this, the hwcb-io arm fell back to the XLA transform because the
# BHW-ordered kernels would have re-introduced the boundary crossings the
# layout exists to avoid (models/cidnet.py input_layout="hwcb").
# ---------------------------------------------------------------------------


def _rgb_to_hvi_hwcb_io_impl(img_hwcb, k, interpret):
    h, w, _, b = img_hwcb.shape
    planes, n = _to_planes_bhw(jnp.transpose(img_hwcb, (2, 0, 1, 3)))  # (3,H,W,B)
    out = _run(_hvit_kernel, planes, k, interpret=interpret)
    out = out.reshape(3, -1)[:, :n].reshape(3, h, w, b)
    return jnp.transpose(out, (1, 2, 0, 3)).astype(img_hwcb.dtype)  # (H,W,3,B)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _rgb_to_hvi_hwcb_io_p(img, k, interpret):
    return _rgb_to_hvi_hwcb_io_impl(img, k, interpret)


def _rgb_hwcb_io_fwd(img, k, interpret):
    return _rgb_to_hvi_hwcb_io_impl(img, k, interpret), (img, k)


def _rgb_hwcb_io_bwd(interpret, res, ct):
    img, k = res
    _, vjp = jax.vjp(lambda i, kk: _ref.rgb_to_hvi(i, kk, channel_axis=2), img, k)
    return vjp(ct)


_rgb_to_hvi_hwcb_io_p.defvjp(_rgb_hwcb_io_fwd, _rgb_hwcb_io_bwd)


def rgb_to_hvi_pallas_hwcb_io(img_hwcb: jnp.ndarray, k, *, interpret: Optional[bool] = None) -> jnp.ndarray:
    """HWCB RGB -> HWCB HVI, fused kernel, no lane-crossing transposes."""
    if interpret is None:
        interpret = force_interpret()
    return _rgb_to_hvi_hwcb_io_p(img_hwcb, jnp.asarray(k, jnp.float32).reshape(()), interpret)


def _hvi_to_rgb_hwcb_io_impl(hvi_hwcb, k, gates, interpret):
    gated, gated2, alpha, alpha_s = gates
    h, w, _, b = hvi_hwcb.shape
    planes, n = _to_planes_bhw(jnp.transpose(hvi_hwcb, (2, 0, 1, 3)))
    kern = functools.partial(
        _phvit_kernel, gated=gated, gated2=gated2, alpha=alpha, alpha_s=alpha_s
    )
    out = _run(kern, planes, k, interpret=interpret)
    out = out.reshape(3, -1)[:, :n].reshape(3, h, w, b)
    return jnp.transpose(out, (1, 2, 0, 3)).astype(hvi_hwcb.dtype)  # (H,W,3,B)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _hvi_to_rgb_hwcb_io_p(hvi, k, gates, interpret):
    return _hvi_to_rgb_hwcb_io_impl(hvi, k, gates, interpret)


def _inv_hwcb_io_fwd(hvi, k, gates, interpret):
    return _hvi_to_rgb_hwcb_io_impl(hvi, k, gates, interpret), (hvi, k)


def _inv_hwcb_io_bwd(gates, interpret, res, ct):
    hvi, k = res
    gated, gated2, alpha, alpha_s = gates

    def twin(hvi_hwcb, kk):
        return _ref.hvi_to_rgb(
            hvi_hwcb, kk, gated=gated, gated2=gated2, alpha=alpha,
            alpha_s=alpha_s, channel_axis=2,
        )

    _, vjp = jax.vjp(twin, hvi, k)
    return vjp(ct)


_hvi_to_rgb_hwcb_io_p.defvjp(_inv_hwcb_io_fwd, _inv_hwcb_io_bwd)


def hvi_to_rgb_pallas_hwcb_io(
    hvi_hwcb: jnp.ndarray,
    k,
    *,
    gated: bool = False,
    gated2: bool = False,
    alpha: float = 1.0,
    alpha_s: float = 1.3,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """HWCB HVI -> HWCB RGB, fused kernel, no lane-crossing transposes."""
    if interpret is None:
        interpret = force_interpret()
    return _hvi_to_rgb_hwcb_io_p(
        hvi_hwcb,
        jnp.asarray(k, jnp.float32).reshape(()),
        (bool(gated), bool(gated2), float(alpha), float(alpha_s)),
        interpret,
    )
