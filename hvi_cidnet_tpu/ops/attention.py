"""Channel-wise ("transposed") attention — XLA path + per-batch Pallas kernel.

The CxC channel attention shared by CAB and TNSM (reference net/LCA.py:26-36,
net/TNSM.py:98-114).  Two executions:

* ``channel_attention_xla`` — einsum contraction directly on the HWCB
  layout.  XLA's dot lowering relayouts q/k/v to batch-major internally
  (the 10.8 GB/fwd ``{1,2,0,3}`` copy pool of the round-2 HLO audit).
* ``attention_pallas`` — ONE kernel per image: grid over batch with
  (C, HW) blocks; q/k norms, temperature, per-head block-diagonal masking,
  fp32 softmax, the value contraction AND the folded output projection all
  happen in VMEM.  Needs batch-major (B, C, HW) operands, produced by
  XLA-side transposes in the wrapper (in-kernel 3-D transposes crash
  Mosaic — docs/ROUND2_NOTES.md).

MEASURED NEGATIVE at serving geometry (experiments/attn_land_r3.py,
same-window v5e): end-to-end from HWCB the kernel+transposes LOSE to the
XLA einsum at every level — L1 17.1 vs 11.3 ms, L2 9.4 vs 6.9, L3 6.6 vs
5.9.  The kernel body itself is faster (round-2 probe: 9.76 vs 14.28 ms at
L1 pre-transposed), but each HWCB->(B,C,HW) transpose costs ~7.6 ms in XLA
and a Pallas transpose is unavailable: the direct 3-D transpose crashes
Mosaic and even a decomposed minor-swap step hangs its compiler >13 min
(experiments/transpose_kernel_r3.py).  Hence the dispatcher defaults OFF
(``ATTN_USE_PALLAS=1`` opts in); the XLA einsum path — whose internal
relayouts are cheaper than any user-level transpose — stays the default.

Numerics match the XLA path: scores accumulate fp32 on the MXU, softmax is
fp32, the value matmul rounds once to the activation dtype.  Backward runs
the XLA twin's VJP (custom_vjp), so autodiff is exact and partitionable.
"""

from __future__ import annotations

import functools
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hvi_cidnet_tpu.ops.pallas_gate import backend_ok, force_interpret, kernel_flag, pallas_allowed

_VMEM_BUDGET = 96 * 1024 * 1024


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def use_attn_pallas(h: int, w: int, c: int, b: int, dtype) -> bool:
    """Kernel viable: TPU (or interpret), allowed in this trace, and the
    per-image (C, HW) blocks fit the VMEM budget with double-buffered IO.
    No batch-alignment constraint — the grid is per image."""
    if not kernel_flag("attn_pallas"):
        # default OFF: measured slower than the XLA einsum once the
        # batch-major transposes are paid (module docstring)
        return False
    if not (pallas_allowed() and backend_ok()):
        return False
    itemsize = jnp.dtype(dtype).itemsize
    sub = 8 * (4 // itemsize)  # min sublane tile: f32 8, bf16 16
    n = _round_up(h * w, 128)
    cp = _round_up(c, sub)
    # q, k, v, out blocks double-buffered + fp32 scores/attn + weight rows
    vmem = 4 * 2 * cp * n * itemsize + 3 * _round_up(c, 8) * _round_up(c, 128) * 4
    return vmem <= _VMEM_BUDGET


# ---------------------------------------------------------------------------
# XLA path (HWCB-native einsums)
# ---------------------------------------------------------------------------


def _finish_scores(scores, inv_q, inv_k, temperature, heads, w_proj, normalize_qk):
    """Raw (B,C,D) scores -> softmaxed (and optionally projection-folded)
    attention matrix, shared by the HWCB and NCB feed arms."""
    c = scores.shape[1]
    cp = c // heads
    if normalize_qk:
        scores = scores * inv_q[:, :, None] * inv_k[:, None, :]
    # row c belongs to head c // cp; the reference scales row-wise by that
    # head's temperature (net/LCA.py:33)
    temp_per_c = jnp.repeat(temperature.reshape(heads).astype(jnp.float32), cp)
    scores = scores * temp_per_c[None, :, None]
    if heads > 1:
        head_id = np.arange(c) // cp
        block = jnp.asarray(head_id[:, None] == head_id[None, :])
        scores = jnp.where(block[None], scores, -jnp.inf)
    attn = jax.nn.softmax(scores, axis=-1)  # block-diag == per-head softmax
    if w_proj is not None:
        # fold the downstream 1x1 projection into the tiny attention matrix:
        # proj(attn @ v) == (proj^T attn) @ v — removes one full-size
        # read+write of the attention output per site
        attn = jnp.einsum("co,bcd->bod", w_proj[0, 0].astype(jnp.float32), attn)
    return attn


def channel_attention_xla(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    temperature: jnp.ndarray,
    heads: int,
    *,
    normalize_qk: bool = True,
    w_proj: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Einsum attention on HWCB feature maps.

    Computes a CxC score matrix per batch by contracting both spatial axes
    directly from the native layout (no transposed copy of the feature
    map), masks it block-diagonal per head before the fp32 softmax — for
    c <= 144 the extra cross-head FLOPs are trivial next to the layout
    copies a per-head reshape costs (profiled: 27% of device time).

    Head semantics match the reference's ``rearrange('b (head c) h w ->
    b head c (h w)')`` (net/LCA.py:26-28): torch channel index
    c = head * c_ph + i, preserved by our channel axis.  TNSM's variant
    skips the L2 normalization (net/TNSM.py:98-104).

    The torch ``F.normalize`` over the spatial axis (x / max(||x||_2,
    1e-12), applied to q and k) is algebraically hoisted PAST the
    contraction in both arms: (q/|q|)·(k/|k|) == (q·k) / (|q||k|) — the raw
    scores are rescaled by per-(channel, batch) norms instead of rewriting
    the full q/k feature maps (saves two full HBM passes per attention
    site; the f32 score accumulation is unchanged, so this is exact up to
    f32 rounding order).

    ``attn_ncb_feed`` seam (ATTN_NCB_FEED=1): the same contraction fed from
    a flattened (N,C,B) view — a free reshape since H,W are major-adjacent
    in HWCB — presenting a different operand shape to XLA's layout
    assignment.  Built for the train-geometry relayout pool (~30 ms/step at
    b=16, where batch-in-lanes pads 16->128; VERDICT r3 item 7); identical
    math, so both arms are parity-tested.
    """
    if kernel_flag("attn_ncb_feed"):
        h, w, c, b = q.shape
        qn = q.reshape(h * w, c, b)
        kn = k.reshape(h * w, c, b)
        vn = v.reshape(h * w, c, b)
        scores = jnp.einsum("ncb,ndb->bcd", qn, kn, preferred_element_type=jnp.float32)

        def _inv_norm_ncb(t):  # (1/max(|t_cb|, 1e-12)) as (B, C)
            sq = jnp.sum(jnp.square(t.astype(jnp.float32)), axis=0)
            return jax.lax.rsqrt(jnp.maximum(sq, 1e-24)).T

        attn = _finish_scores(
            scores,
            _inv_norm_ncb(qn) if normalize_qk else None,
            _inv_norm_ncb(kn) if normalize_qk else None,
            temperature, heads, w_proj, normalize_qk,
        )
        out = jnp.einsum("bcd,ndb->ncb", attn.astype(v.dtype), vn)
        return out.reshape(h, w, c, b)

    scores = jnp.einsum("hwcb,hwdb->bcd", q, k, preferred_element_type=jnp.float32)

    def _inv_norm(t):  # (1/max(|t_cb|, 1e-12)) as (B, C)
        sq = jnp.sum(jnp.square(t.astype(jnp.float32)), axis=(0, 1))
        return jax.lax.rsqrt(jnp.maximum(sq, 1e-24)).T

    attn = _finish_scores(
        scores,
        _inv_norm(q) if normalize_qk else None,
        _inv_norm(k) if normalize_qk else None,
        temperature, heads, w_proj, normalize_qk,
    )
    # no preferred_element_type: the MXU accumulates fp32 internally and
    # rounds once to the output dtype — requesting f32 out materializes an
    # extra full-size cast pass per attention site
    return jnp.einsum("bcd,hwdb->hwcb", attn.astype(v.dtype), v)


# ---------------------------------------------------------------------------
# Per-batch Pallas kernel
# ---------------------------------------------------------------------------


def _attn_kernel(q_ref, k_ref, v_ref, temp_ref, wproj_ref, o_ref, *, heads, cp, normalize_qk, fold_proj):
    f32 = jnp.float32
    q = q_ref[0]  # (C, N)
    k = k_ref[0]
    v = v_ref[0]
    c = q.shape[0]
    # raw scores: contract the spatial axis (lanes on both operands —
    # verified supported by Mosaic, docs/ROUND2_NOTES.md)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=f32
    )  # (C, C)
    if normalize_qk:
        nq = jax.lax.rsqrt(
            jnp.maximum(jnp.sum(jnp.square(q.astype(f32)), axis=1, keepdims=True), 1e-24)
        )
        nk = jax.lax.rsqrt(
            jnp.maximum(jnp.sum(jnp.square(k.astype(f32)), axis=1, keepdims=True), 1e-24)
        )
        s = s * nq * nk.T
    s = s * temp_ref[:]  # (C, 1) broadcast: per-row head temperature
    if heads > 1:
        row = jax.lax.broadcasted_iota(jnp.int32, (c, c), 0) // cp
        col = jax.lax.broadcasted_iota(jnp.int32, (c, c), 1) // cp
        s = jnp.where(row == col, s, -jnp.inf)
    a = jax.nn.softmax(s, axis=-1)
    if fold_proj:
        # folded projection: out = (w^T a) v
        a = jax.lax.dot_general(
            wproj_ref[:], a, (((0,), (0,)), ((), ())), preferred_element_type=f32
        )
    out = jax.lax.dot_general(
        a.astype(v.dtype), v, (((1,), (0,)), ((), ())), preferred_element_type=f32
    )
    o_ref[0] = out.astype(o_ref.dtype)


def attention_bcn_pallas(
    qb: jnp.ndarray,
    kb: jnp.ndarray,
    vb: jnp.ndarray,
    temp_per_c: jnp.ndarray,
    w_proj_cc: Optional[jnp.ndarray],
    heads: int,
    *,
    normalize_qk: bool,
    interpret: bool = False,
) -> jnp.ndarray:
    """(B, C, N) batch-major attention; one grid step per image."""
    b, c, n = qb.shape
    cp = c // heads
    fold = w_proj_cc is not None
    kern = functools.partial(
        _attn_kernel, heads=heads, cp=cp, normalize_qk=normalize_qk, fold_proj=fold
    )
    spec = pl.BlockSpec((1, c, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    wspec = pl.BlockSpec((c, c), lambda i: (0, 0), memory_space=pltpu.VMEM)
    tspec = pl.BlockSpec((c, 1), lambda i: (0, 0), memory_space=pltpu.VMEM)
    wp = w_proj_cc if fold else jnp.zeros((c, c), jnp.float32)
    return pl.pallas_call(
        kern,
        grid=(b,),
        in_specs=[spec, spec, spec, tspec, wspec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((b, c, n), qb.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_BUDGET + 16 * 1024 * 1024),
        interpret=interpret,
    )(qb, kb, vb, temp_per_c.reshape(c, 1), wp)


def _to_bcn(t: jnp.ndarray) -> jnp.ndarray:
    h, w, c, b = t.shape
    return jnp.transpose(t, (3, 2, 0, 1)).reshape(b, c, h * w)


def _from_bcn(t: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    b, c, _ = t.shape
    return jnp.transpose(t.reshape(b, c, h, w), (2, 3, 1, 0))


def _attention_pallas_impl(q, k, v, temperature, w_proj, heads, normalize_qk):
    h, w, c, b = q.shape
    cp = c // heads
    temp_per_c = jnp.repeat(temperature.reshape(heads).astype(jnp.float32), cp)
    wp = w_proj[0, 0].astype(jnp.float32) if w_proj is not None else None
    ob = attention_bcn_pallas(
        _to_bcn(q), _to_bcn(k), _to_bcn(v), temp_per_c, wp, heads,
        normalize_qk=normalize_qk, interpret=force_interpret(),
    )
    return _from_bcn(ob, h, w)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _attn_p(q, k, v, temperature, w_proj, heads, normalize_qk):
    return _attention_pallas_impl(q, k, v, temperature, w_proj, heads, normalize_qk)


def _attn_fwd(q, k, v, temperature, w_proj, heads, normalize_qk):
    out = _attention_pallas_impl(q, k, v, temperature, w_proj, heads, normalize_qk)
    return out, (q, k, v, temperature, w_proj)


def _attn_bwd(heads, normalize_qk, res, ct):
    q, k, v, temperature, w_proj = res

    def twin(q, k, v, temperature, w_proj):
        return channel_attention_xla(
            q, k, v, temperature, heads, normalize_qk=normalize_qk, w_proj=w_proj
        )

    _, vjp = jax.vjp(twin, q, k, v, temperature, w_proj)
    return vjp(ct)


_attn_p.defvjp(_attn_fwd, _attn_bwd)


# ---------------------------------------------------------------------------
# Public dispatcher
# ---------------------------------------------------------------------------


def channel_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    temperature: jnp.ndarray,
    heads: int,
    *,
    normalize_qk: bool = True,
    w_proj: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Channel attention on HWCB maps; Pallas per-image kernel when viable."""
    h, w, c, b = q.shape
    if use_attn_pallas(h, w, c, b, q.dtype):
        return _attn_p(q, k, v, temperature, w_proj, heads, normalize_qk)
    return channel_attention_xla(
        q, k, v, temperature, heads, normalize_qk=normalize_qk, w_proj=w_proj
    )
