# ARCHIVED (round 2): NHCW-era kernel; the model now flows HWCB and no
# longer routes through this.  Kept for the kernel-experiment record.
"""Fused Pallas mega-kernel: NormDownsample = conv3x3 + bilinear x0.5 + PReLU.

The UNet's downsample blocks (net/transformer_utils.py:31-48) are the
framework's hottest sites: a dense 3x3 conv at full resolution whose output
is immediately halved.  The XLA path materializes the full-res conv output
and re-reads it twice (H-half, W-half); this kernel keeps the conv rows in
VMEM/registers and writes only the quarter-size result:

* conv rows via in-VMEM im2col + one MXU matmul per row (see
  ops/conv_pallas.py for the building blocks);
* H-half: each output row is an fp32 fma of conv rows {2o, 2o+1, 2o+2} with
  the exact banded torch weights (row 2o+2 is reused as the next row's 2o);
* W-half: a (WL, W/2-pad) interpolation matmul on the MXU;
* PReLU fused on the way out.

Measured 1.9x over the XLA op chain at level-0 shapes (11.3 vs 21.7 ms,
batch 32 x 400x600x36 bf16).  Numerics: fp32 conv accumulation and fp32
H-band fma — at least as precise as the XLA chain; bf16 outputs differ by
<= 1 ulp.  Backward routes through the XLA composition via custom_vjp.
"""

from __future__ import annotations

import functools
import os

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hvi_cidnet_tpu.ops.resize import _band_weights, _interp_matrix

_TO = 8  # output rows per program


def should_use_fused_down() -> bool:
    """Opt-in: FUSED_DOWN_USE_PALLAS=1 on TPU.

    1.9x over the XLA op chain standalone, but currently -5% end-to-end
    (162 -> 155 img/s): the host-side ``jnp.pad`` to kernel-aligned shapes
    re-materializes the full-res input, and the pallas boundary stops XLA
    from fusing the producer into that pad.  Path to flip the default:
    handle the H/W/C boundaries inside the kernel (third halo ref + wrap
    masking + DMA-padded channel loads) so the unpadded activation feeds the
    kernel directly.
    """
    if os.environ.get("FUSED_DOWN_USE_PALLAS", "0") != "1":
        return False
    return jax.default_backend() == "tpu"


def _xla_down(x, w, alpha):
    from hvi_cidnet_tpu.ops.conv import conv2d, prelu
    from hvi_cidnet_tpu.ops.resize import _half_major, _axis_matmul_major

    def scale_half_nhcw(t):
        t = _half_major(t, 1)
        return _axis_matmul_major(t, 3, t.shape[3] // 2, True)

    return prelu(scale_half_nhcw(conv2d(x, w.astype(x.dtype), padding="SAME")), alpha)


def _kernel(al_ref, a_ref, b_ref, w_ref, abc_ref, mwt_ref, o_ref, pat_scr, *, ti, cp, wl, to):
    a32 = a_ref[0].astype(jnp.float32)
    b32 = b_ref[0].astype(jnp.float32)
    rolled_a = [a_ref[0], None, None]
    rolled_b = [b_ref[0], None, None]
    for dx in (1, 2):
        rolled_a[dx] = pltpu.roll(a32, wl - dx, 2).astype(a_ref.dtype)
        rolled_b[dx] = pltpu.roll(b32, wl - dx, 2).astype(a_ref.dtype)

    def conv_row(r):
        for dy in range(3):
            rr = r + dy
            for dx in range(3):
                i = dy * 3 + dx
                src = rolled_a[dx][rr] if rr < ti else rolled_b[dx][rr - ti]
                pat_scr[i * cp : (i + 1) * cp, :] = src
        return jax.lax.dot_general(
            w_ref[:], pat_scr[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    alpha_v = al_ref[0]
    rows = []
    prev = conv_row(0)
    for o in range(to):
        r0 = prev
        r1 = conv_row(2 * o + 1)
        r2 = conv_row(2 * o + 2)
        prev = r2
        hh = abc_ref[o, 0] * r0 + abc_ref[o, 1] * r1 + abc_ref[o, 2] * r2
        half = jax.lax.dot_general(
            hh.astype(mwt_ref.dtype), mwt_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        half = jnp.maximum(half, 0) + alpha_v * jnp.minimum(half, 0)
        rows.append(half)
    o_ref[0] = jnp.stack(rows, axis=0).astype(o_ref.dtype)


def _pallas_down(x, w, alpha):
    b, h, c, wdim = x.shape
    cout = w.shape[-1]
    cp = (c + 7) // 8 * 8
    wl = (wdim + 2 + 127) // 128 * 128
    ho, wo = h // 2, wdim // 2
    wol = (wo + 127) // 128 * 128
    n_tiles = (ho + _TO - 1) // _TO
    ti = 2 * _TO
    hp = (n_tiles + 1) * ti
    xp = jnp.pad(x, ((0, 0), (1, hp - h - 1), (0, cp - c), (1, wl - wdim - 1)))

    wm = jnp.transpose(w.astype(jnp.float32), (3, 0, 1, 2)).reshape(cout, 9, c)
    wm = jnp.pad(wm, ((0, 0), (0, 0), (0, cp - c))).reshape(cout, 9 * cp).astype(x.dtype)

    a_np, b_np, c_np = _band_weights(h, ho, [lambda i: 2 * i, lambda i: 2 * i + 1, lambda i: 2 * i + 2])
    abc = np.zeros((n_tiles * _TO, 3), np.float32)
    abc[:ho, 0] = a_np
    abc[:ho, 1] = b_np
    abc[:ho, 2] = c_np

    mwt = np.zeros((wl, wol), np.float32)
    mwt[:wdim, :wo] = _interp_matrix(wdim, wo, True).T

    kern = functools.partial(_kernel, ti=ti, cp=cp, wl=wl, to=_TO)
    out = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, n_tiles),
            in_specs=[
                pl.BlockSpec((1, ti, cp, wl), lambda bb, t, _s: (bb, t, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, ti, cp, wl), lambda bb, t, _s: (bb, t + 1, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((cout, 9 * cp), lambda bb, t, _s: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((_TO, 3), lambda bb, t, _s: (t, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((wl, wol), lambda bb, t, _s: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, _TO, cout, wol), lambda bb, t, _s: (bb, t, 0, 0), memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((9 * cp, wl), x.dtype)],
        ),
        out_shape=jax.ShapeDtypeStruct((b, n_tiles * _TO, cout, wol), x.dtype),
    )(
        jnp.asarray(alpha, jnp.float32).reshape(1),
        xp,
        xp,
        wm,
        jnp.asarray(abc),
        jnp.asarray(mwt, x.dtype),
    )
    return out[:, :ho, :, :wo]


@jax.custom_vjp
def fused_norm_downsample(x, w, alpha):
    """prelu(bilinear_half(conv3x3_same(x, w)), alpha) — one kernel on TPU.

    x: NHCW with even H (>= 2*_TO rows recommended) and even W; w: HWIO;
    alpha: PReLU scalar.  Falls back to the XLA composition off-TPU or when
    FUSED_DOWN_USE_PALLAS=0.
    """
    if should_use_fused_down():
        return _pallas_down(x, w, alpha)
    return _xla_down(x, w, alpha)


def _fwd(x, w, alpha):
    return fused_norm_downsample(x, w, alpha), (x, w, alpha)


def _bwd(res, ct):
    x, w, alpha = res
    _, vjp = jax.vjp(_xla_down, x, w, alpha)
    return vjp(ct)


fused_norm_downsample.defvjp(_fwd, _bwd)
