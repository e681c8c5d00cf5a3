#!/usr/bin/env python
"""Driver benchmark: 600x400 bf16 CIDNet inference throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the north-star target of 1,500 600x400 images/sec bf16 on a single
TPU v5e chip (BASELINE.json; the reference publishes no throughput numbers).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import jax
import jax.numpy as jnp

from hvi_cidnet_tpu.models.cidnet import CIDNetConfig, cidnet_forward, init_cidnet

TARGET = 1500.0  # img/s, driver-set north star
H, W = 400, 600  # LOL eval images are 600x400 (WxH); both already x8-divisible


def main() -> None:
    # batch 128 ~doubles throughput vs 32 (per-op overheads amortize);
    # 192+ exceeds the 16 GB HBM at 600x400.
    batch = int(os.environ.get("BENCH_BATCH", "128"))
    iters = int(os.environ.get("BENCH_ITERS", "8"))
    cfg = CIDNetConfig(variant="base")
    params = init_cidnet(jax.random.PRNGKey(0), cfg)
    params = {k: (v.astype(jnp.bfloat16) if v.ndim == 4 else v) for k, v in params.items()}
    x = jnp.asarray(
        np.random.default_rng(0).uniform(0, 1, (batch, H, W, 3)), jnp.bfloat16
    )

    def one(p, x):
        return jnp.clip(cidnet_forward(p, x, cfg, compute_dtype=jnp.bfloat16), 0, 1)

    # Sustained-throughput methodology: iterate INSIDE one jit program via
    # scan (chained so iterations can't collapse), because (a) the remote-TPU
    # tunnel adds multi-ms fixed overhead per dispatched program, which a
    # local deployment doesn't pay, and (b) ``block_until_ready`` through the
    # tunnel can return early — the scalar host fetch below is the only
    # reliable completion barrier.
    @jax.jit
    def loop(p, x):
        def body(carry, _):
            y = one(p, x + carry * jnp.bfloat16(1e-6))
            return jnp.mean(y).astype(jnp.bfloat16), None
        final, _ = jax.lax.scan(body, jnp.bfloat16(0.0), None, length=iters)
        return final

    _ = float(loop(params, x))  # compile + warmup
    t0 = time.perf_counter()
    _ = float(loop(params, x))
    dt = (time.perf_counter() - t0) / iters
    throughput = batch / dt

    print(
        json.dumps(
            {
                "metric": "600x400 images/sec/chip (bf16 CIDNet inference)",
                "value": round(throughput, 2),
                "unit": "img/s",
                "vs_baseline": round(throughput / TARGET, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
