"""Class-split flat-layout pilot (VERDICT r2 item 2) — the decisive number.

The flat serving layout's premise is that the whole forward can run as a
chain of Pallas kernels (convs as K-stacked im2col matmuls, dw/LN/resize
as vector ops) with no relayouts.  Round-3 measurements already killed
the vector half (Mosaic dw codegen 2.5-3x XLA, ops/iel_pallas.py) — this
probe measures the MXU half at the pilot site the verdict names: the
NormDownsample stem conv3x3 (36->36 @ L0, 600x400 batch 128).

An in-kernel im2col conv issues dots with N = C_out = 36 and K = 9*C_in
= 324.  The MXU pads N to 128 and K to 384 per pass => <= 24% useful
utilization, an analytic floor of ~15 ms vs XLA's measured ~5 ms for the
same conv (XLA's conv emitter schedules the systolic array with spatial
output positions in the lane dim, which plain Pallas dots cannot
express).  This probe stages the im2col operand in VMEM and times ONLY
the dots — a best case that charges the kernel nothing for the 9 shifted
copies, the halo reads, or the fused resize tail.

Result recorded in docs/ROUND3_NOTES.md (go/no-go for the flat pilot).
"""

from __future__ import annotations

import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hvi_cidnet_tpu.ops.conv import conv3x3_same

H, W, C, B = 400, 600, 36, 128
COUT = 36
K = 9 * C  # im2col contraction


def timed(fn, *args, iters=6):
    @jax.jit
    def loop(*a):
        def body(carry, _):
            y = fn(a[0] + carry, *a[1:])
            return (jnp.sum(y[-1, -1]) * 1e-20).astype(a[0].dtype), None

        final, _ = jax.lax.scan(body, jnp.zeros((), a[0].dtype), None, length=iters)
        return final

    _ = float(loop(*args))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        _ = float(loop(*args))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def _dot_kernel(a_ref, w_ref, o_ref):
    # a: (K, TILE_N) im2col block with the contraction in SUBLANE-major
    # position, w: (COUT, K); out: (COUT, TILE_N).  Contraction over a's
    # sublane dim / w's lanes — the orientation Mosaic supports.
    o_ref[:] = jax.lax.dot_general(
        w_ref[:],
        a_ref[:],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


def pallas_im2col_dots(a: jnp.ndarray, wmat: jnp.ndarray, tile_n: int) -> jnp.ndarray:
    """a: (K, N_cols) staged im2col operand; returns (COUT, N_cols)."""
    n = a.shape[1]
    return pl.pallas_call(
        _dot_kernel,
        grid=(n // tile_n,),
        in_specs=[
            pl.BlockSpec((K, tile_n), lambda t: (0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((COUT, K), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((COUT, tile_n), lambda t: (0, t), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((COUT, n), a.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(a, wmat)


def main() -> None:
    rng = np.random.default_rng(0)
    # big operands are generated ON DEVICE: host float64 generation plus the
    # 2.2 GB tunnel transfer took >9 min on the 1-core driver box
    key = jax.random.PRNGKey(0)
    x = jax.jit(lambda k: jax.random.uniform(k, (H, W, C, B), jnp.bfloat16, -1, 1))(key)
    wt = jnp.asarray(rng.uniform(-0.1, 0.1, (3, 3, C, COUT)), jnp.bfloat16)

    dt = timed(conv3x3_same, x, wt)
    print(f"XLA conv3x3 36->36 @L0: {dt*1e3:.2f} ms")

    # best-case staged im2col operand: (K, HW-cols * B) — we only charge
    # the dots.  Use a W-row slab (B*W cols per H row) as the N extent.
    n_cols = W * B  # one H row's worth of output columns
    a = jax.jit(lambda k: jax.random.uniform(k, (K, n_cols), jnp.bfloat16, -1, 1))(
        jax.random.PRNGKey(1)
    )
    wmat = jnp.asarray(rng.uniform(-0.1, 0.1, (COUT, K)), jnp.bfloat16)
    for tile_n in (512, 1024, 2048):
        dt_row = timed(functools.partial(pallas_im2col_dots, tile_n=tile_n), a, wmat)
        # H rows of this work = the whole conv's dots
        print(
            f"pallas im2col dots (tile_n={tile_n}): {dt_row*1e3:.3f} ms/row "
            f"=> {dt_row*H*1e3:.1f} ms/conv (dots only, operands pre-staged)"
        )

    useful_tf = 2 * H * W * B * C * COUT * 9 / 1e12
    print(f"useful conv flops: {useful_tf*1e3:.0f} GFLOP; XLA eff: "
          f"{useful_tf/dt:.0f} TF/s of ~197 peak")


if __name__ == "__main__":
    main()
