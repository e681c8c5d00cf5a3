# ARCHIVED (round 2): NHCW-era kernel; superseded by the HWCB layout.
"""Pallas TPU kernel for dense 3x3 stride-1 convolution in NHCW layout.

The UNet's hot convs have tiny channel counts (36-144); XLA's conv runs them
at ~10 TF/s on v5e.  This kernel reaches ~15 TF/s (1.5x end-to-end on the
op) by doing explicit in-VMEM im2col and one MXU matmul per output row:

* grid over (batch, H row-tiles); each program sees its row block plus the
  next block (halo via a second BlockSpec — Mosaic pipelines both);
* W-shifts of the patch rows come from ``pltpu.roll`` (computed in fp32:
  Mosaic's rotate only supports 32-bit data);
* patches are stored tap-major into a (9*CP, WL) VMEM scratch (CP = channels
  padded to sublanes, WL = width padded to lanes) and contracted against a
  (Cout, 9*CP) weight matrix — K≈360 vs the naive K=36.

The efficiency ceiling is M = Cout (36 -> 128-pad = ~26% MXU): intrinsic to
the architecture's channel widths, not the kernel.

Gradients: ``custom_vjp`` whose backward runs the XLA conv path — bitwise
the same math (both accumulate fp32), no second kernel needed.
Selection: on by default on TPU; ``CONV_USE_PALLAS=0`` opts out (CPU/tests
always use the XLA path).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TH = 16  # output rows per program


def should_use_pallas_conv() -> bool:
    """Opt-in: CONV_USE_PALLAS=1 on TPU.

    Standalone the kernel beats XLA's conv 1.5x, but dropped into the full
    graph it *loses* (162 -> 109 img/s at 600x400): the pallas_call boundary
    blocks XLA from fusing the surrounding pad/resize/PReLU elementwise work
    it otherwise folds into the conv.  Default off until the kernel absorbs
    those neighbors (fused NormDownsample/NormUpsample mega-kernels).
    """
    if os.environ.get("CONV_USE_PALLAS", "0") != "1":
        return False
    return jax.default_backend() == "tpu"


def _xla_conv3x3(x, w, pad_mode):
    if pad_mode == "edge":
        x = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (1, 1)), mode="edge")
        padding = "VALID"
    else:
        padding = "SAME"
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1), padding,
        dimension_numbers=("NHCW", "HWIO", "NHCW"),
    )


def _kernel(a_ref, b_ref, w_ref, o_ref, pat_scr, *, th, cp, wl, cout):
    a32 = a_ref[0].astype(jnp.float32)
    b32 = b_ref[0].astype(jnp.float32)
    rolled_a = [a_ref[0], None, None]
    rolled_b = [b_ref[0], None, None]
    for dx in (1, 2):
        rolled_a[dx] = pltpu.roll(a32, wl - dx, 2).astype(a_ref.dtype)
        rolled_b[dx] = pltpu.roll(b32, wl - dx, 2).astype(a_ref.dtype)
    rows_out = []
    for h in range(th):
        for dy in range(3):
            r = h + dy
            for dx in range(3):
                i = dy * 3 + dx
                src = rolled_a[dx][r] if r < th else rolled_b[dx][r - th]
                pat_scr[i * cp : (i + 1) * cp, :] = src
        rows_out.append(
            jax.lax.dot_general(
                w_ref[:], pat_scr[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        )
    o_ref[0] = jnp.stack(rows_out, axis=0).astype(o_ref.dtype)


def _pallas_conv3x3(x, w, pad_mode):
    b, h, c, wdim = x.shape
    cout = w.shape[-1]
    cp = (c + 7) // 8 * 8
    wl = (wdim + 2 + 127) // 128 * 128
    n_tiles = (h + _TH - 1) // _TH
    hp = (n_tiles + 1) * _TH

    if pad_mode == "edge":
        xe = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (1, 1)), mode="edge")
        xp = jnp.pad(xe, ((0, 0), (0, hp - h - 2), (0, cp - c), (0, wl - wdim - 2)))
    else:
        xp = jnp.pad(x, ((0, 0), (1, hp - h - 1), (0, cp - c), (1, wl - wdim - 1)))

    wm = jnp.transpose(w.astype(jnp.float32), (3, 0, 1, 2)).reshape(cout, 9, c)
    wm = jnp.pad(wm, ((0, 0), (0, 0), (0, cp - c))).reshape(cout, 9 * cp).astype(x.dtype)

    kern = functools.partial(_kernel, th=_TH, cp=cp, wl=wl, cout=cout)
    out = pl.pallas_call(
        kern,
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec((1, _TH, cp, wl), lambda bb, t: (bb, t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _TH, cp, wl), lambda bb, t: (bb, t + 1, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((cout, 9 * cp), lambda bb, t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, _TH, cout, wl), lambda bb, t: (bb, t, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_tiles * _TH, cout, wl), x.dtype),
        scratch_shapes=[pltpu.VMEM((9 * cp, wl), x.dtype)],
    )(xp, xp, wm)
    return out[:, :h, :, :wdim]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def conv3x3_nhcw(x, w, pad_mode="zero"):
    """Dense 3x3 stride-1 conv on NHCW; pad_mode 'zero' (torch padding=1) or
    'edge' (ReplicationPad2d(1) + VALID, the stem/head blocks)."""
    if should_use_pallas_conv():
        return _pallas_conv3x3(x, w, pad_mode)
    return _xla_conv3x3(x, w, pad_mode)


def _fwd(x, w, pad_mode):
    return conv3x3_nhcw(x, w, pad_mode), (x, w)


def _bwd(pad_mode, res, ct):
    x, w = res
    _, vjp = jax.vjp(lambda x_, w_: _xla_conv3x3(x_, w_, pad_mode), x, w)
    return vjp(ct)


conv3x3_nhcw.defvjp(_fwd, _bwd)
