"""Fused bilinear x0.5 / x2 (+ PReLU) Pallas kernels on HWCB activations.

The XLA banded-reshape resizes are the #1 cost pool of the round-2 forward
(~220 ms of 812: x0.5@L0 31.6 ms vs a ~10 ms r+w floor; x2@L1 49 ms —
experiments/resize2_r2.py).  The interleave/deinterleave steps materialize
5-D stack/reshape copies XLA won't fuse, and strided *lane* access is a
gather.  In HWCB the minor dims are (C, B), so H and W are both LEADING
dims of a kernel block — strided slices along them are tile-granular VMEM
moves, no lane shuffles.  These kernels do the whole 2-D resize (+trailing
PReLU for NormDownsample) in one HBM read + one write.

Weights are the exact rows of the dense torch ``align_corners=True``
interpolation matrix (ops/resize.py:_band_weights), applied in the same
fma order as the banded XLA path.

Reference semantics: ``nn.UpsamplingBilinear2d(0.5 / 2)`` inside
NormDownsample / NormUpsample (net/transformer_utils.py:38-40, 57-59).
Backward: custom_vjp via the XLA twin (training batches are not
lane-aligned anyway; see ``use_resize_pallas``).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hvi_cidnet_tpu.ops.resize import _band_weights
from hvi_cidnet_tpu.ops.pallas_gate import backend_ok, force_interpret, kernel_flag, pallas_allowed


def use_resize_pallas(b: int) -> bool:
    """TPU (or forced interpret mode), kernels allowed in this trace, and B
    a lane-tile multiple (otherwise (C, B) tiles pad the lane dim 8-16x and
    the kernel loses to XLA; small-batch eval/train take the banded path).
    SPMD safety is structural — see ops/pallas_gate.py."""
    if not kernel_flag("resize_pallas"):
        return False
    return pallas_allowed() and backend_ok() and b % 128 == 0


def _pick_th(h_units: int, bytes_per_unit: float, budget=40 * 1024 * 1024) -> int:
    for th in (16, 8, 4, 2, 1):
        if h_units % th == 0 and th * bytes_per_unit <= budget:
            return th
    return 1


def _col(vals: np.ndarray) -> jnp.ndarray:
    """Per-row weight vector as (N, 1, 1, 1) f32."""
    return jnp.asarray(np.asarray(vals, np.float32)).reshape(-1, 1, 1, 1)


def _row(vals: np.ndarray) -> jnp.ndarray:
    """Per-col weight vector as (1, N, 1, 1) f32."""
    return jnp.asarray(np.asarray(vals, np.float32)).reshape(1, -1, 1, 1)


def _wspec(n_lead):
    return pl.BlockSpec((n_lead, 1, 1, 1), lambda t: (t, 0, 0, 0), memory_space=pltpu.VMEM)


def _wspec_row(n):
    return pl.BlockSpec((1, n, 1, 1), lambda t: (0, 0, 0, 0), memory_space=pltpu.VMEM)


# ---------------------------------------------------------------------------
# x0.5 (+ optional PReLU)
# ---------------------------------------------------------------------------


def _half_kernel(x0_ref, xp_ref, ha_ref, hb_ref, hc_ref, wa_ref, wb_ref, wc_ref,
                 alpha_ref, o_ref, mid, *, th, w, use_prelu):
    # NOTE Mosaic: strided slices are supported on REFS only (value strides
    # lower to unsupported >2D gathers) and strided loads/stores are
    # 32-bit-only.  The H combine avoids strides entirely — each output row
    # reads its three input rows CONTIGUOUSLY from the (bf16) input block —
    # so only the W stage needs the f32 ``mid`` scratch.
    wo = w // 2
    f32 = jnp.float32
    for i in range(th):
        r0 = x0_ref[2 * i].astype(f32)
        r1 = x0_ref[2 * i + 1].astype(f32)
        # row 2i+2: within the block except for the tile's last output row,
        # which reads the next block's first row (garbage on the final
        # tile; its hc weight is 0)
        r2 = (x0_ref[2 * i + 2] if 2 * i + 2 < 2 * th else xp_ref[0]).astype(f32)
        mid[i, 0:w] = r0 * ha_ref[i] + r1 * hb_ref[i] + r2 * hc_ref[i]
    mid[:, w:w + 1] = jnp.zeros_like(mid[:, w:w + 1])  # col w: wc is 0 there
    dt = f32

    we = mid[:, 0:2 * wo:2]
    wod = mid[:, 1:2 * wo:2]
    wn = mid[:, 2:2 * wo + 1:2]  # cols 2j+2 (hits the zeroed col w at the end)
    out = (we * wa_ref[:].astype(dt) + wod * wb_ref[:].astype(dt)
           + wn * wc_ref[:].astype(dt))
    if use_prelu:
        al = alpha_ref[0, 0].astype(dt)
        out = jnp.maximum(out, 0) + al * jnp.minimum(out, 0)
    o_ref[:] = out.astype(o_ref.dtype)


def scale_half_pallas(x: jnp.ndarray, *, prelu_alpha=None, interpret: bool = False) -> jnp.ndarray:
    """(H, W, C, B) -> (H//2, W//2, C, B), torch UpsamplingBilinear2d(0.5)."""
    h, w, c, b = x.shape
    ho, wo = h // 2, w // 2
    ha, hb, hc = _band_weights(h, ho, [lambda i: 2 * i, lambda i: 2 * i + 1, lambda i: 2 * i + 2])
    wa, wb, wc = _band_weights(w, wo, [lambda i: 2 * i, lambda i: 2 * i + 1, lambda i: 2 * i + 2])

    th = _pick_th(ho, 5.0 * w * c * b * 4)
    nt = ho // th
    use_prelu = prelu_alpha is not None
    alpha = jnp.asarray(prelu_alpha if use_prelu else 0.0, jnp.float32).reshape(1, 1)

    kern = functools.partial(_half_kernel, th=th, w=w, use_prelu=use_prelu)
    return pl.pallas_call(
        kern,
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((2 * th, w, c, b), lambda t: (t, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, w, c, b), lambda t: (jnp.minimum(2 * th * (t + 1), h - 1), 0, 0, 0), memory_space=pltpu.VMEM),
            _wspec(th), _wspec(th), _wspec(th),
            _wspec_row(wo), _wspec_row(wo), _wspec_row(wo),
            pl.BlockSpec((1, 1), lambda t: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((th, wo, c, b), lambda t: (t, 0, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ho, wo, c, b), x.dtype),
        scratch_shapes=[pltpu.VMEM((th, w + 1, c, b), jnp.float32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(x, x, _col(ha), _col(hb), _col(hc), _row(wa), _row(wb), _row(wc), alpha)


# ---------------------------------------------------------------------------
# x2
# ---------------------------------------------------------------------------


def _double_kernel(xm_ref, x0_ref, xp_ref, hae_ref, hbe_ref, hao_ref, hbo_ref,
                   wae_ref, wbe_ref, wao_ref, wbo_ref, o_ref, scr, mid, out_scr,
                   *, th, w):
    scr[0] = xm_ref[0]       # row a-1 (weight 0 at the true top edge)
    scr[1:th + 1] = x0_ref[:]
    scr[th + 1] = xp_ref[0]  # row a+th (weight 0 at the true bottom edge)

    dt = jnp.float32
    cur = scr[1:th + 1].astype(dt)
    prev = scr[0:th].astype(dt)
    nxt = scr[2:th + 2].astype(dt)
    # mid data lives in cols [1, w+1); cols 0 and w+1 are zeroed so the
    # edge taps (whose weights are 0) never touch uninitialized VMEM
    mid[:, 0:1] = jnp.zeros_like(mid[:, 0:1])
    mid[:, w + 1:w + 2] = jnp.zeros_like(mid[:, w + 1:w + 2])
    mid[0:2 * th:2, 1:w + 1] = prev * hae_ref[:].astype(dt) + cur * hbe_ref[:].astype(dt)
    mid[1:2 * th:2, 1:w + 1] = cur * hao_ref[:].astype(dt) + nxt * hbo_ref[:].astype(dt)

    m = mid[:, 1:w + 1]
    left = mid[:, 0:w]       # col j-1
    right = mid[:, 2:w + 2]  # col j+1
    # strided stores are 32-bit-only too: interleave in an f32 scratch,
    # then one contiguous cast copy to the (bf16) output block
    out_scr[:, 0:2 * w:2] = left * wae_ref[:].astype(dt) + m * wbe_ref[:].astype(dt)
    out_scr[:, 1:2 * w:2] = m * wao_ref[:].astype(dt) + right * wbo_ref[:].astype(dt)
    o_ref[:] = out_scr[:].astype(o_ref.dtype)


def scale_double_pallas(x: jnp.ndarray, *, interpret: bool = False) -> jnp.ndarray:
    """(H, W, C, B) -> (2H, 2W, C, B), torch UpsamplingBilinear2d(2)."""
    h, w, c, b = x.shape
    oh, ow = 2 * h, 2 * w
    ae_f, be_f = _band_weights(h, oh, [lambda i: i // 2 - 1, lambda i: i // 2])
    ao_f, bo_f = _band_weights(h, oh, [lambda i: i // 2, lambda i: i // 2 + 1])
    wae_f, wbe_f = _band_weights(w, ow, [lambda i: i // 2 - 1, lambda i: i // 2])
    wao_f, wbo_f = _band_weights(w, ow, [lambda i: i // 2, lambda i: i // 2 + 1])

    th = _pick_th(h, 9.0 * w * c * b * 4)
    nt = h // th

    kern = functools.partial(_double_kernel, th=th, w=w)
    return pl.pallas_call(
        kern,
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((1, w, c, b), lambda t: (jnp.maximum(th * t - 1, 0), 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((th, w, c, b), lambda t: (t, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, w, c, b), lambda t: (jnp.minimum(th * (t + 1), h - 1), 0, 0, 0), memory_space=pltpu.VMEM),
            _wspec(th), _wspec(th), _wspec(th), _wspec(th),
            _wspec_row(w), _wspec_row(w), _wspec_row(w), _wspec_row(w),
        ],
        out_specs=pl.BlockSpec((2 * th, ow, c, b), lambda t: (t, 0, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((oh, ow, c, b), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((th + 2, w, c, b), x.dtype),
            pltpu.VMEM((2 * th, w + 2, c, b), jnp.float32),
            pltpu.VMEM((2 * th, 2 * w, c, b), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(x, x, x,
      _col(ae_f[0::2]), _col(be_f[0::2]), _col(ao_f[1::2]), _col(bo_f[1::2]),
      _row(wae_f[0::2]), _row(wbe_f[0::2]), _row(wao_f[1::2]), _row(wbo_f[1::2]))


# ---------------------------------------------------------------------------
# Model-facing wrappers (gated dispatch + XLA-twin backward)
# ---------------------------------------------------------------------------


def _xla_half_prelu(x, alpha):
    from hvi_cidnet_tpu.ops.conv import prelu
    from hvi_cidnet_tpu.ops.resize import scale_half_hwcb

    return prelu(scale_half_hwcb(x), alpha)


@jax.custom_vjp
def _half_prelu_p(x: jnp.ndarray, alpha: jnp.ndarray) -> jnp.ndarray:
    return scale_half_pallas(x, prelu_alpha=alpha, interpret=force_interpret())


def _half_fwd(x, alpha):
    return _half_prelu_p(x, alpha), (x, alpha)


def _half_bwd(res, ct):
    x, alpha = res
    _, vjp = jax.vjp(_xla_half_prelu, x, alpha)
    return vjp(ct)


_half_prelu_p.defvjp(_half_fwd, _half_bwd)


def half_prelu(x: jnp.ndarray, alpha: jnp.ndarray) -> jnp.ndarray:
    """bilinear x0.5 + PReLU, fused on TPU when the batch is lane-aligned.

    GSPMD-partitioned traces (``cidnet_forward(use_pallas=False)``) always
    take the banded XLA path via the trace-time gate; backward always does.
    """
    if use_resize_pallas(x.shape[3]):
        return _half_prelu_p(x, alpha)
    return _xla_half_prelu(x, alpha)


def _xla_double(x):
    from hvi_cidnet_tpu.ops.resize import scale_double_hwcb

    return scale_double_hwcb(x)


@jax.custom_vjp
def _double_p(x: jnp.ndarray) -> jnp.ndarray:
    return scale_double_pallas(x, interpret=force_interpret())


def _double_fwd(x):
    return _double_p(x), (x,)


def _double_bwd(res, ct):
    (x,) = res
    _, vjp = jax.vjp(_xla_double, x)
    return vjp(ct)


_double_p.defvjp(_double_fwd, _double_bwd)


def double_bilinear(x: jnp.ndarray) -> jnp.ndarray:
    """bilinear x2, fused on TPU when the batch is lane-aligned."""
    if use_resize_pallas(x.shape[3]):
        return _double_p(x)
    return _xla_double(x)
