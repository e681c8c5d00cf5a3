"""Fused IEL-branch Pallas kernel: ``tanh(dw2(dw1(y))) + dw1(y)`` in one pass.

The round-3 forward profile puts ~54% of device time in the fusion pool,
and a traffic audit attributes the bulk of it to the IEL's depthwise-conv
chains (net/LCA.py:53-60): per branch XLA runs two conv programs over the
*hidden*-width tensor (2.66x the block channels) — dw1 (read+write), then
dw2 with the fused tanh+residual epilogue (read conv input + re-read the
residual + write) ≈ 5 full HBM passes.  Both convs are depthwise 3x3s, so
in HWCB they are pure shifted FMAs along the two LEADING block dims — no
MXU, no transposes: this kernel computes the whole branch in one read +
one write (plus a (th+4)/th halo-read overhead).

Zero-'SAME' boundary semantics match ``dwconv3x3`` exactly: halo rows are
zeroed at the image top/bottom via @pl.when, and the W-axis scratch
borders are zeroed columns.  Tap accumulation is fp32 with one rounding to
the activation dtype per conv — the same contract as the XLA convs; the
tanh+residual tail runs in the activation dtype like the XLA epilogue.
Backward: custom_vjp via the XLA twin.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hvi_cidnet_tpu.ops.pallas_gate import backend_ok, force_interpret, kernel_flag, pallas_allowed


def use_iel_pallas(b: int) -> bool:
    """Opt-in (``IEL_USE_PALLAS=1``): MEASURED NET NEGATIVE at serving.

    Same-window TPU A/B (experiments/iel_bench_r3.py, 600x400 batch 128
    bf16): kernel 40.4 / 22.5 / 14.7 ms vs XLA 14.6 / 10.4 / 5.9 ms at
    L1/L2/L3; end-to-end bench 147.6 vs 229.9 img/s.  The fusion halves
    HBM traffic (5 passes -> 2+halo) but Mosaic's vector codegen spends
    ~18 tap-loads + 18 bf16->f32 converts + 18 FMAs per element, an
    issue-slot floor (~7.6 ms at L1) already close to XLA's memory-bound
    5-pass schedule — and realized codegen lands 5x above that floor.
    Kept as an exact, tested seam in case Mosaic codegen improves."""
    if not kernel_flag("iel_pallas"):
        return False
    return pallas_allowed() and backend_ok() and b % 128 == 0


def _pick_tiles(h: int, w: int, c: int, b: int, itemsize: int, budget=72 * 1024 * 1024) -> Optional[Tuple[int, int]]:
    """(th, ct) under the VMEM budget; th even (halo strips are 2-row
    blocks) and h % th == 0, else None -> XLA fallback.

    Prefer LARGE th (halo-read overhead is (th+4)/th) over large ct.  The
    kernel accumulates row-by-row, so fp32 temporaries are ~constant."""
    if h % 2:
        return None
    min_ct = 16 if itemsize == 2 else 8  # sublane tile floor
    for th in (16, 8, 4, 2):
        if h % th:
            continue
        for ct in (64, 32, 16, 8):
            ctc = max(min(ct, c), min_ct)
            # s (th+4) + t1 (th+2) + double-buffered io (main th + strips 4
            # + out th) + ~6 rows of fp32 temporaries
            rows = (th + 4) + (th + 2) + 2 * (2 * th + 4) + 6 * (4 // itemsize)
            if rows * (w + 2) * ctc * b * itemsize <= budget:
                return th, ctc
    return None


def _branch_kernel(y0_ref, yu_ref, yd_ref, w1_ref, w2_ref, o_ref, s_ref, t_ref, *, th, w, c, ct):
    """Blocks: y0 (th, W, ct, B) main; yu/yd (2, W, ct, B) halo strips."""
    f32 = jnp.float32
    nt = pl.num_programs(0)
    t = pl.program_id(0)

    # Partial last channel block (c % ct != 0): Pallas fills the out-of-
    # bounds tail of each block with UNSPECIFIED padding.  Depthwise convs
    # never mix channels, but 0 * NaN = NaN and relying on Mosaic padding
    # semantics is fragile (ADVICE r3) — mask BOTH the data and the weights
    # to zero in the invalid lanes so the tail is provably 0 end-to-end
    # (the out-block's OOB writes are then dropped by Pallas).
    if c % ct:
        ch = jax.lax.broadcasted_iota(jnp.int32, (1, 1, ct, 1), 2)
        chmask = (pl.program_id(1) * ct + ch) < c  # (1, 1, ct, 1)
        w1 = jnp.where(chmask[0], w1_ref[:], 0)
        w2 = jnp.where(chmask[0], w2_ref[:], 0)
    else:
        chmask = None
        w1 = w1_ref[:]
        w2 = w2_ref[:]

    # ---- stage 0: scratch s = [upper halo(2) | main(th) | lower halo(2)]
    # with W borders zeroed (zero-'SAME' columns)
    s_ref[:, 0:1] = jnp.zeros_like(s_ref[:, 0:1])
    s_ref[:, w + 1:w + 2] = jnp.zeros_like(s_ref[:, w + 1:w + 2])
    s_ref[0:2, 1:w + 1] = yu_ref[:]
    s_ref[2:th + 2, 1:w + 1] = y0_ref[:]
    s_ref[th + 2:th + 4, 1:w + 1] = yd_ref[:]
    if chmask is not None:
        s_ref[:] = jnp.where(chmask, s_ref[:], 0)

    @pl.when(t == 0)
    def _():  # image top: zero-'SAME' rows
        s_ref[0:2] = jnp.zeros_like(s_ref[0:2])

    @pl.when(t == nt - 1)
    def _():  # image bottom
        s_ref[th + 2:th + 4] = jnp.zeros_like(s_ref[th + 2:th + 4])

    def row_conv(ref, j, wv):
        """fp32 3x3 tap sum for output row j (ref rows j..j+2, W+2 cols)."""
        acc = ref[j, 0:w].astype(f32) * wv[0]  # (w, ct, b) * (1, ct, 1)
        for k in range(1, 9):
            dy, dx = divmod(k, 3)
            acc = acc + ref[j + dy, dx:dx + w].astype(f32) * wv[k]
        return acc  # (w, ct, b)

    # ---- dw1 over output rows [-1, th+1) -> t1 (th+2 rows), W borders
    # zeroed; row-by-row keeps fp32 temporaries to ~one row
    t_ref[:, 0:1] = jnp.zeros_like(t_ref[:, 0:1])
    t_ref[:, w + 1:w + 2] = jnp.zeros_like(t_ref[:, w + 1:w + 2])
    for j in range(th + 2):
        t_ref[j, 1:w + 1] = row_conv(s_ref, j, w1).astype(t_ref.dtype)

    # dw2's zero-'SAME' pads the *t1* tensor: its out-of-image rows are
    # zeros, NOT conv-extrapolated values (image row 0 is still inside the
    # halo t1 rows' windows above, so they come out nonzero).
    @pl.when(t == 0)
    def _():
        t_ref[0:1] = jnp.zeros_like(t_ref[0:1])

    @pl.when(t == nt - 1)
    def _():
        t_ref[th + 1:th + 2] = jnp.zeros_like(t_ref[th + 1:th + 2])

    # ---- dw2 (+ tanh + residual, in the activation dtype like XLA's
    # epilogue) over the th output rows
    for j in range(th):
        acc2 = row_conv(t_ref, j, w2)
        o_ref[j] = jnp.tanh(acc2.astype(o_ref.dtype)) + t_ref[j + 1, 1:w + 1]


def iel_branch_pallas(
    y: jnp.ndarray,
    w_dw1: jnp.ndarray,
    w_dw2: jnp.ndarray,
    *,
    interpret: bool = False,
) -> jnp.ndarray:
    """(H, W, C, B) -> tanh(dw2(dw1(y))) + dw1(y), one kernel."""
    h, w, c, b = y.shape
    itemsize = jnp.dtype(y.dtype).itemsize
    tiles = _pick_tiles(h, w, c, b, itemsize)
    assert tiles is not None, "caller must gate on viable tiling"
    th, ct = tiles
    nt = h // th

    def wmat(wt):  # (3, 3, 1, C) -> (9, 1, C, 1) f32
        return jnp.transpose(wt.astype(jnp.float32), (0, 1, 3, 2)).reshape(9, 1, c, 1)

    kern = functools.partial(_branch_kernel, th=th, w=w, c=c, ct=ct)
    # halo strips in 2-row block units: rows [t*th-2, t*th) and
    # [t*th+th, t*th+th+2), clamped at the edges (kernel zeroes them there)
    h2 = th // 2
    hu = pl.BlockSpec(
        (2, w, ct, b),
        lambda t, n: (jnp.maximum(t * h2 - 1, 0), 0, n, 0),
        memory_space=pltpu.VMEM,
    )
    hd = pl.BlockSpec(
        (2, w, ct, b),
        lambda t, n: (jnp.minimum(t * h2 + h2, h // 2 - 1), 0, n, 0),
        memory_space=pltpu.VMEM,
    )
    wspec = pl.BlockSpec((9, 1, ct, 1), lambda t, n: (0, 0, n, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid=(nt, pl.cdiv(c, ct)),
        in_specs=[
            pl.BlockSpec((th, w, ct, b), lambda t, n: (t, 0, n, 0), memory_space=pltpu.VMEM),
            hu,
            hd,
            wspec,
            wspec,
        ],
        out_specs=pl.BlockSpec((th, w, ct, b), lambda t, n: (t, 0, n, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(y.shape, y.dtype),
        scratch_shapes=[
            pltpu.VMEM((th + 4, w + 2, ct, b), y.dtype),
            pltpu.VMEM((th + 2, w + 2, ct, b), y.dtype),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(y, y, y, wmat(w_dw1), wmat(w_dw2))


def _xla_branch(y, w_dw1, w_dw2):
    from hvi_cidnet_tpu.ops.conv import dwconv3x3

    t1 = dwconv3x3(y, w_dw1)
    return jnp.tanh(dwconv3x3(t1, w_dw2)) + t1


@jax.custom_vjp
def _branch_p(y, w_dw1, w_dw2):
    return iel_branch_pallas(y, w_dw1, w_dw2, interpret=force_interpret())


def _branch_fwd(y, w_dw1, w_dw2):
    return _branch_p(y, w_dw1, w_dw2), (y, w_dw1, w_dw2)


def _branch_bwd(res, ct):
    y, w1, w2 = res
    _, vjp = jax.vjp(_xla_branch, y, w1, w2)
    return vjp(ct)


_branch_p.defvjp(_branch_fwd, _branch_bwd)


def iel_branch(y: jnp.ndarray, w_dw1: jnp.ndarray, w_dw2: jnp.ndarray) -> jnp.ndarray:
    """Dispatching IEL branch: fused kernel at serving shapes, XLA twin
    otherwise."""
    if use_iel_pallas(y.shape[3]) and _pick_tiles(
        y.shape[0], y.shape[1], y.shape[2], y.shape[3], jnp.dtype(y.dtype).itemsize
    ) is not None:
        return _branch_p(y, w_dw1, w_dw2)
    return _xla_branch(y, w_dw1, w_dw2)
