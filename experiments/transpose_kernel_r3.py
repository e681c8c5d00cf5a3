"""Round-3 probe: Pallas (HW, C, B) <-> (B, C, HW) transpose kernels.

XLA's user-level transpose T1 costs 7.56 ms at L1 (5x the ~1.4 ms r+w
floor), which is what keeps the per-batch attention kernel from paying
(attn_land_r3.py: kernel+4 transposes loses to the XLA einsum at L2/L3).

Known Mosaic facts (docs/ROUND2_NOTES.md): a DIRECT 3-D transpose that
moves a leading dim into lanes crashes the compiler.  Hypothesis: the same
permutation decomposed into supported steps compiles —

  fwd (hwt, C, B) -> (B, C, hwt):
    s1 minor-pair swap   (hwt, C, B) -> (hwt, B, C)
    s2 major<->sublane   (hwt, B, C) -> (B, hwt, C)   [lanes untouched]
    s3 minor-pair swap   (B, hwt, C) -> (B, C, hwt)

Grid over hw tiles; output written at lane offset t*hwt.  Measures each
step's viability separately, then the fused kernel vs XLA's transpose.
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

H, W, C, B = 300, 200, 36, 128
HW = H * W


def _t_kernel(x_ref, o_ref, *, steps):
    x = x_ref[:]  # (hwt, C, B)
    if steps >= 1:
        x = jnp.swapaxes(x, 1, 2)  # (hwt, B, C)
    if steps >= 2:
        x = jnp.transpose(x, (1, 0, 2))  # (B, hwt, C)
    if steps >= 3:
        x = jnp.swapaxes(x, 1, 2)  # (B, C, hwt)
    o_ref[:] = x


def make_transpose(hwt, steps, dtype):
    shapes = {
        0: (hwt, C, B),
        1: (hwt, B, C),
        2: (B, hwt, C),
        3: (B, C, hwt),
    }
    out_block = shapes[steps]
    nt = HW // hwt

    def idx_out(t):
        # place the tile along whichever axis hwt landed on
        if steps == 0:
            return (t, 0, 0)
        if steps == 1:
            return (t, 0, 0)
        if steps == 2:
            return (0, t, 0)
        return (0, 0, t)

    full_out = list(out_block)
    for i, s in enumerate(out_block):
        if s == hwt:
            full_out[i] = HW
    return pl.pallas_call(
        functools.partial(_t_kernel, steps=steps),
        grid=(nt,),
        in_specs=[pl.BlockSpec((hwt, C, B), lambda t: (t, 0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(out_block, idx_out, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(tuple(full_out), dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )


def timed(fn, x, iters=16, label=""):
    @jax.jit
    def loop(x):
        def body(c, _):
            y = fn(x + c.astype(x.dtype))
            return jnp.mean(y[0, 0]).astype(jnp.float32) * 1e-12, None

        f, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None, length=iters)
        return f

    t0 = time.perf_counter()
    _ = float(loop(x))
    tc = time.perf_counter() - t0
    t0 = time.perf_counter()
    _ = float(loop(x))
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{label:52s} {dt:8.3f} ms  (compile {tc:.1f}s)", flush=True)
    return dt


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((HW, C, B)), jnp.bfloat16)
    xf = x.astype(jnp.float32)

    for hwt in (512,):
        for steps in (1, 2, 3):
            for arr, tag in ((x, "bf16"), (xf, "f32")):
                label = f"hwt={hwt} steps={steps} {tag}"
                try:
                    fn = make_transpose(hwt, steps, arr.dtype)
                    # correctness on small slice vs jnp
                    got = np.asarray(fn(arr))
                    if steps == 3:
                        want = np.asarray(
                            jnp.transpose(arr.reshape(HW, C, B), (2, 1, 0))
                        )
                        np.testing.assert_allclose(
                            got.astype(np.float32), want.astype(np.float32)
                        )
                        print(f"{label}: EXACT", flush=True)
                    timed(fn, arr, label=label)
                except Exception as e:
                    print(f"{label}: FAIL {type(e).__name__}: {str(e)[:160]}", flush=True)

    timed(lambda a: jnp.transpose(a, (2, 1, 0)), x, label="XLA transpose (2,1,0) bf16")
    timed(lambda a: jnp.transpose(a, (2, 1, 0)), xf, label="XLA transpose (2,1,0) f32")


if __name__ == "__main__":
    main()
