"""Profile the bench-config forward: per-op device-time buckets + HW ceilings.

Also measures the practical hardware ceilings through the tunnel:
  * pure HBM copy bandwidth (elementwise x*1.0001)
  * big-matmul TF/s (4k x 4k x 4k bf16)
so the op buckets can be read as % of attainable.
"""

from __future__ import annotations

import collections
import os
import re
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from hvi_cidnet_tpu.models.cidnet import CIDNetConfig, cidnet_forward, init_cidnet
from hvi_cidnet_tpu.utils import profiling


def timed_loop(fn, *args, iters=8):
    @jax.jit
    def loop(*a):
        def body(carry, _):
            y = fn(a[0] + carry, *a[1:])
            return (jnp.sum(y) * 1e-20).astype(a[0].dtype), None

        final, _ = jax.lax.scan(body, jnp.zeros((), a[0].dtype), None, length=iters)
        return final

    _ = float(loop(*args))
    t0 = time.perf_counter()
    _ = float(loop(*args))
    return (time.perf_counter() - t0) / iters


def main():
    print("devices:", jax.devices())

    # --- ceilings ---
    big = jnp.ones((64, 1024, 1024), jnp.bfloat16)  # 128 MB
    dt = timed_loop(lambda x: x * 1.0001 + 0.001, big, iters=16)
    gb = 2 * big.size * 2 / 1e9
    print(f"copy bandwidth: {gb / dt:.0f} GB/s ({dt*1e3:.3f} ms)")

    a = jnp.ones((4096, 4096), jnp.bfloat16)
    dt = timed_loop(lambda x: jnp.dot(x, x), a, iters=16)
    fl = 2 * 4096**3
    print(f"matmul: {fl / dt / 1e12:.1f} TF/s")

    # --- forward profile ---
    batch = int(os.environ.get("BENCH_BATCH", "128"))
    cfg = CIDNetConfig(variant="base")
    params = init_cidnet(jax.random.PRNGKey(0), cfg)
    params = {k: (v.astype(jnp.bfloat16) if v.ndim == 4 else v) for k, v in params.items()}
    x = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (batch, 400, 600, 3)), jnp.bfloat16)

    @jax.jit
    def fwd(p, x):
        return jnp.clip(cidnet_forward(p, x, cfg, compute_dtype=jnp.bfloat16), 0, 1)

    y = fwd(params, x)
    _ = float(jnp.sum(y.astype(jnp.float32)))
    with profiling.trace("/tmp/fwd_trace"):
        for _ in range(2):
            y = fwd(params, x)
        _ = float(jnp.sum(y.astype(jnp.float32)))

    agg = profiling.op_breakdown("/tmp/fwd_trace", top=60)
    total = sum(agg.values())
    print(f"\ntotal device us in trace: {total:.0f} (2 fwd)")

    # bucket by op family
    fam = collections.Counter()
    for name, us in agg.items():
        key = re.sub(r"[._\-]?\d+$", "", name)
        fam[key] += us
    for name, us in fam.most_common(40):
        print(f"  {name:55s} {us/2/1000.0:9.2f} ms/fwd  {100*us/total:5.1f}%")


if __name__ == "__main__":
    main()
