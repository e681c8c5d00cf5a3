"""Round-3: standalone timing of the landed attention kernel per level.

Isolates each bench-geometry attention site end-to-end FROM HWCB (including
the XLA-side batch-major transposes) against the XLA einsum path, to find
which geometry (if any) stalls the tunnel-side compile and whether the
kernel pays once transposes are counted.

  L1: (300, 200, 36, 128)  heads=2   L2: (150, 100, 72, 128) heads=4
  L3: (75, 50, 144, 128)   heads=8

Usage: python experiments/attn_land_r3.py [L1|L2|L3 ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from hvi_cidnet_tpu.ops.attention import (
    _attention_pallas_impl,
    channel_attention_xla,
    use_attn_pallas,
)

GEOMS = {
    "L1": (300, 200, 36, 128, 2),
    "L2": (150, 100, 72, 128, 4),
    "L3": (75, 50, 144, 128, 8),
}


def timed(fn, *args, iters=8, label=""):
    @jax.jit
    def loop(*a):
        def body(carry, _):
            y = fn(a[0] + carry.astype(a[0].dtype), *a[1:])
            return jnp.mean(y[0, 0]).astype(jnp.float32) * 1e-12, None

        final, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None, length=iters)
        return final

    t0 = time.perf_counter()
    _ = float(loop(*args))
    tc = time.perf_counter() - t0
    t0 = time.perf_counter()
    _ = float(loop(*args))
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{label:48s} {dt:8.3f} ms   (compile {tc:.1f}s)", flush=True)
    return dt


def main():
    levels = sys.argv[1:] or ["L1", "L2", "L3"]
    rng = np.random.default_rng(0)
    for lv in levels:
        h, w, c, b, heads = GEOMS[lv]
        mk = lambda: jnp.asarray(rng.standard_normal((h, w, c, b)) * 0.5, jnp.bfloat16)
        q, k, v = mk(), mk(), mk()
        temp = jnp.ones((heads, 1, 1), jnp.float32)
        w_proj = jnp.asarray(rng.standard_normal((1, 1, c, c)) * 0.1, jnp.float32)
        print(f"-- {lv} {q.shape} heads={heads} gate={use_attn_pallas(h, w, c, b, q.dtype)}", flush=True)
        timed(
            lambda q, k, v: channel_attention_xla(q, k, v, temp, heads, w_proj=w_proj),
            q, k, v, label=f"{lv} XLA einsum attention",
        )
        timed(
            lambda q, k, v: _attention_pallas_impl(q, k, v, temp, w_proj, heads, True),
            q, k, v, label=f"{lv} pallas kernel (+transposes)",
        )


if __name__ == "__main__":
    main()
