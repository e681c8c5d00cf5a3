# ARCHIVED (round 2): NHCW-era kernel; superseded by the HWCB layout.
"""Fused Pallas TPU kernel: LayerNorm + IEL (gated tanh FFN) [+ residual].

Why this kernel exists: the IEL interiors are the single largest HBM-traffic
site in the network.  At the bench shape (600x400, batch 128) the XLA graph
writes ~64 GB of 95-channel level-1 intermediates per forward (plus 24 GB at
191 ch, 13 GB at 383 ch — measured from the optimized HLO), because XLA-TPU
does not fuse across conv boundaries and the IEL chain is 11 conv/elementwise
ops deep.  This kernel reads the 36/72/144-channel input once and writes the
36/72/144-channel output once; every expanded-width tensor lives in VMEM.

Covers (reference net/LCA.py:45-67 plus the pre-norm from :71-93):

    ln = LayerNorm_cf(x)                      # transformer_utils.py:5-29
    x12 = dwconv3x3(conv1x1(ln, w_pi), w_dw)  # both halves, one matmul
    x12 = tanh(dwconv3x3(x12, w_dw12)) + x12  # gates
    out = conv1x1(x1 * x2, w_po) [+ x]        # HV_LCA: no residual; I_LCA: +x

TPU mapping — the whole tile is laid out **2-D**: channels in sublanes, all
rows side by side along lanes as 128-aligned W-windows ``(C, R*WL)``.  That
makes every step one large op instead of R small ones:

* LayerNorm: one pair of sublane reduces over the full scratch (channel LN
  is per-pixel, so flattened rows are transparent to it);
* the 1x1 expansion to both gate halves: ONE (2*CHP, C) x (C, R*WL) MXU
  matmul (halves stacked at sublane offsets 0 / CHP);
* depthwise 3x3: W-taps are whole-scratch f32 lane-rolls by +-1 (the lane
  that wraps across a row boundary lands on a zeroed pad lane, so per-row
  masking is only needed in the WL == W corner case); H-taps are lane-rolls
  by +-WL.  pltpu.roll is 32-bit-only — everything after the matmul stays
  f32, which is also at-least-XLA precision;
* grid (batch, H-tiles); the 2-row H halo comes from THREE input refs whose
  index maps clamp t-1/t+1 at the edges — no host-side pad of the
  activation (a host pad is what made round-1's fused kernels net-negative).

Rows outside the true image and lanes beyond the true width are zeroed at
the LayerNorm and re-masked after the first dw stage (zero-'SAME' semantics).

Backward: custom_vjp re-running the XLA composition (same math, fp32
accumulation in both paths).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def should_use_fused_iel() -> bool:
    """Default ON for TPU; IEL_USE_PALLAS=0 opts out."""
    if os.environ.get("IEL_USE_PALLAS", "1") != "1":
        return False
    return jax.default_backend() == "tpu"


# ---------------------------------------------------------------------------
# XLA reference composition (also the backward path)
# ---------------------------------------------------------------------------


def _xla_ln_iel(x, ln_w, ln_b, w_pi, w_dw, w_dw1, w_dw2, w_po, residual):
    from hvi_cidnet_tpu.ops.conv import conv1x1, dwconv3x3, layer_norm_channels

    ch = w_po.shape[2]
    t = layer_norm_channels(x, ln_w, ln_b)
    x1 = dwconv3x3(conv1x1(t, w_pi[..., :ch]), w_dw[..., :ch])
    x2 = dwconv3x3(conv1x1(t, w_pi[..., ch:]), w_dw[..., ch:])
    x1 = jnp.tanh(dwconv3x3(x1, w_dw1)) + x1
    x2 = jnp.tanh(dwconv3x3(x2, w_dw2)) + x2
    out = conv1x1(x1 * x2, w_po)
    return out + x if residual else out


# ---------------------------------------------------------------------------
# Pallas kernel
# ---------------------------------------------------------------------------


def _dw_flat(m2, taps, wl, w_real, total):
    """Depthwise 3x3 on the flattened (CM, R*WL) scratch value ``m2``.

    taps: list of 9 (CM, 1) f32 arrays, index 3*dy + dx.
    Output slot r = sum_dy sum_dx taps[3dy+dx] * m2[row r+dy-1, w+dx-1]
    (slots 0 and R-1 wrap rows and are garbage — callers never read them).
    """
    left = pltpu.roll(m2, 1, axis=1)           # w-1 at lane w
    right = pltpu.roll(m2, total - 1, axis=1)  # w+1 at lane w
    if wl == w_real:  # no zero pad lane between rows: mask the wrapped lane
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, total), 1)
        left = jnp.where(lane % wl == 0, 0.0, left)
        right = jnp.where(lane % wl == wl - 1, 0.0, right)
    s0 = taps[0] * left + taps[1] * m2 + taps[2] * right
    s1 = taps[3] * left + taps[4] * m2 + taps[5] * right
    s2 = taps[6] * left + taps[7] * m2 + taps[8] * right
    # H taps: slot r needs dy=0 from slot r-1 and dy=2 from slot r+1
    return pltpu.roll(s0, wl, axis=1) + s1 + pltpu.roll(s2, total - wl, axis=1)


def _kernel(
    xm1_ref, x0_ref, xp1_ref, lnw_ref, lnb_ref, wpi_ref, tdw_ref, tg_ref, wpo_ref,
    o_ref, x2d_scr, m_scr, x1_scr,
    *, th, c, chp, wl, w_real, h_real, residual, eps,
):
    t = pl.program_id(1)
    base = t * th
    r_all = th + 4
    total = r_all * wl
    in_dt = x0_ref.dtype
    f32 = jnp.float32

    # 1) gather rows [-2, th+2) into the flat (C, R*WL) scratch
    for lr in range(-2, th + 2):
        if lr < 0:
            src = xm1_ref[0, th + lr]
        elif lr < th:
            src = x0_ref[0, lr]
        else:
            src = xp1_ref[0, lr - th]
        x2d_scr[:, (lr + 2) * wl : (lr + 3) * wl] = src

    # 2) LayerNorm over channels (per-pixel; flattening is transparent),
    #    masked to zero outside the real image (rows and pad lanes) — OOB
    #    block reads are garbage, so masking is select-based.
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, total), 1)
    slot = lane // wl
    grow = slot + (base - 2)
    keep = jnp.logical_and(
        jnp.logical_and(grow >= 0, grow < h_real), lane % wl < w_real
    )
    xr = jnp.where(keep, x2d_scr[:, :].astype(f32), 0.0)
    u = jnp.mean(xr, axis=0, keepdims=True)
    d = xr - u
    s = jnp.mean(d * d, axis=0, keepdims=True)
    y = d * jax.lax.rsqrt(s + eps) * lnw_ref[:, :] + lnb_ref[:, :]
    x2d_scr[:, :] = jnp.where(keep, y, 0.0).astype(in_dt)

    # 3) expand to both gate halves: one MXU matmul
    m_scr[:, :] = jax.lax.dot_general(
        wpi_ref[:, :], x2d_scr[:, :], (((1,), (0,)), ((), ())),
        preferred_element_type=f32,
    )

    # 4) first depthwise -> x12; re-mask (pad lanes pick up real data from
    #    the W-edge taps; invalid rows must stay zero for the gate dw)
    keep1 = jnp.broadcast_to(keep, (2 * chp, total))
    x1_scr[:, :] = jnp.where(
        keep1, _dw_flat(m_scr[:, :], [tdw_ref[i] for i in range(9)], wl, w_real, total), 0.0
    )

    # 5) gate: tanh(dw(x12)) + x12  (reuses the expansion scratch)
    m_scr[:, :] = (
        jnp.tanh(_dw_flat(x1_scr[:, :], [tg_ref[i] for i in range(9)], wl, w_real, total))
        + x1_scr[:, :]
    )

    # 6) product of halves on the [0, th) window, project, residual, write
    win = slice(2 * wl, (th + 2) * wl)
    prod = (m_scr[: chp, win] * m_scr[chp :, win]).astype(in_dt)
    o2d = jax.lax.dot_general(
        wpo_ref[:, :], prod, (((1,), (0,)), ((), ())), preferred_element_type=f32
    )
    for r in range(th):
        o = o2d[:, r * wl : (r + 1) * wl]
        if residual:
            o = o + x0_ref[0, r].astype(f32)
        o_ref[0, r] = o.astype(o_ref.dtype)


def _pallas_ln_iel(x, ln_w, ln_b, w_pi, w_dw, w_dw1, w_dw2, w_po, residual, th=16, interpret=False):
    b, h, c, w = x.shape
    ch = w_po.shape[2]
    chp = (ch + 7) // 8 * 8
    wl = max((w + 127) // 128 * 128, 128)
    th = min(th, (h + 7) // 8 * 8)
    nt = (h + th - 1) // th

    f32 = jnp.float32

    def _half_stack(a, bb):
        """(..., ch) halves -> (..., 2*chp) with halves at 0 / chp."""
        pad = [(0, 0)] * (a.ndim - 1) + [(0, chp - ch)]
        return jnp.concatenate([jnp.pad(a, pad), jnp.pad(bb, pad)], axis=-1)

    # (2*CHP, C) expansion matrix, halves at sublane offsets 0 / CHP
    w_pi32 = w_pi[0, 0].astype(f32)
    wpi_m = _half_stack(w_pi32[:, :ch], w_pi32[:, ch:]).T
    # depthwise taps stacked over both halves: (9, 2*CHP, 1)
    wdw32 = w_dw[:, :, 0, :].astype(f32).reshape(9, 2 * ch)
    tdw = _half_stack(wdw32[:, :ch], wdw32[:, ch:])[:, :, None]
    tg = _half_stack(
        w_dw1[:, :, 0, :].astype(f32).reshape(9, ch),
        w_dw2[:, :, 0, :].astype(f32).reshape(9, ch),
    )[:, :, None]
    wpo_m = jnp.pad(w_po[0, 0].astype(f32).T, ((0, 0), (0, chp - ch)))

    in_dt = x.dtype
    r_all = th + 4
    kern = functools.partial(
        _kernel, th=th, c=c, chp=chp, wl=wl, w_real=w, h_real=h,
        residual=residual, eps=1e-6,
    )
    xspec = lambda fn: pl.BlockSpec((1, th, c, wl), fn, memory_space=pltpu.VMEM)
    wspec = lambda shape: pl.BlockSpec(shape, lambda bb, t: (0,) * len(shape), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid=(b, nt),
        in_specs=[
            xspec(lambda bb, t: (bb, jnp.maximum(t - 1, 0), 0, 0)),
            xspec(lambda bb, t: (bb, t, 0, 0)),
            xspec(lambda bb, t: (bb, jnp.minimum(t + 1, nt - 1), 0, 0)),
            wspec((c, 1)),
            wspec((c, 1)),
            wspec((2 * chp, c)),
            wspec((9, 2 * chp, 1)),
            wspec((9, 2 * chp, 1)),
            wspec((c, chp)),
        ],
        out_specs=pl.BlockSpec((1, th, c, wl), lambda bb, t: (bb, t, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, c, w), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((c, r_all * wl), in_dt),
            pltpu.VMEM((2 * chp, r_all * wl), f32),
            pltpu.VMEM((2 * chp, r_all * wl), f32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(
        x, x, x,
        jnp.asarray(ln_w, f32).reshape(c, 1),
        jnp.asarray(ln_b, f32).reshape(c, 1),
        jnp.asarray(wpi_m, in_dt),
        jnp.asarray(tdw),
        jnp.asarray(tg),
        jnp.asarray(wpo_m, in_dt),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(8,))
def fused_ln_iel(x, ln_w, ln_b, w_pi, w_dw, w_dw1, w_dw2, w_po, residual=False):
    """LayerNorm + IEL (+ optional residual) — one fused kernel on TPU.

    x: NHCW; weights in HWIO exactly as the flat param dict stores them.
    Falls back to the XLA composition off-TPU or when IEL_USE_PALLAS=0.
    """
    if should_use_fused_iel():
        return _pallas_ln_iel(x, ln_w, ln_b, w_pi, w_dw, w_dw1, w_dw2, w_po, residual)
    return _xla_ln_iel(x, ln_w, ln_b, w_pi, w_dw, w_dw1, w_dw2, w_po, residual)


def _fwd(x, ln_w, ln_b, w_pi, w_dw, w_dw1, w_dw2, w_po, residual):
    out = fused_ln_iel(x, ln_w, ln_b, w_pi, w_dw, w_dw1, w_dw2, w_po, residual)
    return out, (x, ln_w, ln_b, w_pi, w_dw, w_dw1, w_dw2, w_po)


def _bwd(residual, res, ct):
    _, vjp = jax.vjp(lambda *a: _xla_ln_iel(*a, residual), *res)
    return vjp(ct)


fused_ln_iel.defvjp(_fwd, _bwd)
