"""Same-window serving throughput for all three variants (round-3 refresh).

README carries round-2 numbers (base 242, MSSA 210 img/s); the tunneled
chip drifts ~10% between windows, so variant comparisons are only
meaningful re-measured together.  Same methodology as bench.py (scan-
chained batches inside one jit; scalar fetch as the completion barrier).

Usage: python experiments/variant_bench_r3.py   (TPU window required)
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from hvi_cidnet_tpu.models.cidnet import CIDNetConfig, cidnet_forward, init_cidnet

H, W, BATCH, ITERS = 400, 600, 128, 8


def measure(variant: str) -> float:
    cfg = CIDNetConfig(variant=variant)
    params = init_cidnet(jax.random.PRNGKey(0), cfg)
    params = {k: (v.astype(jnp.bfloat16) if v.ndim == 4 else v) for k, v in params.items()}
    x = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (BATCH, H, W, 3)), jnp.bfloat16)

    def one(p, xx):
        out = cidnet_forward(p, xx, cfg, compute_dtype=jnp.bfloat16)
        if cfg.variant == "tnsm":
            out = out[0]
        return jnp.clip(out, 0, 1)

    @jax.jit
    def loop(p, xx):
        def body(carry, _):
            y = one(p, xx + carry * jnp.bfloat16(1e-6))
            return jnp.mean(y).astype(jnp.bfloat16), None

        final, _ = jax.lax.scan(body, jnp.bfloat16(0.0), None, length=ITERS)
        return final

    _ = float(loop(params, x))  # compile + warmup
    best = 0.0
    for _ in range(2):
        t0 = time.perf_counter()
        _ = float(loop(params, x))
        best = max(best, BATCH * ITERS / (time.perf_counter() - t0))
    return best


def main() -> None:
    for variant in ("base", "mssa", "tnsm"):
        r = measure(variant)
        print(f"{variant:5s}: {r:7.1f} img/s  (600x400 bf16 batch {BATCH})", flush=True)


if __name__ == "__main__":
    main()
