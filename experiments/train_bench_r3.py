"""Round-3: train-step throughput at the north-star config (VERDICT r2 #4).

North-star config 4 == the reference's LOLv2-real run (train.py:39-90):
crop 256, batch 16, Adam, composite loss (perceptual off here — no VGG
weights in this environment; its cost is a separate known quantity).
Measures the DEVICE-side step (fwd+bwd+Adam, bf16 compute) with the same
chained-scan methodology as bench.py, then dumps a per-op breakdown from
jax.profiler to name the top train-side costs.

Usage:  python experiments/train_bench_r3.py [--batch 16] [--crop 256]
        [--profile]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from hvi_cidnet_tpu.models.cidnet import CIDNetConfig, init_cidnet
from hvi_cidnet_tpu.train.trainer import (
    TrainConfig,
    composite_loss,
    make_optimizer,
    make_train_step,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--crop", type=int, default=256)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--variant", type=str, default="base")
    ap.add_argument("--profile", action="store_true")
    args = ap.parse_args()

    cfg = TrainConfig(
        model=CIDNetConfig(variant=args.variant),
        use_perceptual=False,
        compute_dtype="bfloat16",
    )
    params = init_cidnet(jax.random.PRNGKey(0), cfg.model)
    optimizer = make_optimizer(cfg)
    opt_state = optimizer.init(params)

    rng = np.random.default_rng(0)
    low = jnp.asarray(rng.uniform(0, 0.3, (args.batch, args.crop, args.crop, 3)), jnp.float32)
    high = jnp.asarray(rng.uniform(0.4, 1.0, (args.batch, args.crop, args.crop, 3)), jnp.float32)
    gamma = jnp.asarray(1.0, jnp.float32)

    # chained scan: iterations can't collapse; scalar fetch is the barrier
    @jax.jit
    def loop(params, opt_state, low, high):
        def body(carry, _):
            p, s, shift = carry
            p, s, loss, _ = _step_body(p, s, low + shift, high, gamma)
            return (p, s, loss.astype(jnp.float32) * 1e-9), None

        def _step_body(p, s, lo, hi, g):
            (loss, aux), grads = jax.value_and_grad(composite_loss, has_aux=True)(
                p, lo, hi, g, None, cfg
            )
            updates, s = optimizer.update(grads, s, p)
            import optax

            p = optax.apply_updates(p, updates)
            return p, s, loss, aux["output_rgb"]

        (p, s, shift), _ = jax.lax.scan(
            body, (params, opt_state, jnp.float32(0.0)), None, length=args.iters
        )
        return shift

    _ = float(loop(params, opt_state, low, high))  # compile + warmup
    t0 = time.perf_counter()
    _ = float(loop(params, opt_state, low, high))
    dt = (time.perf_counter() - t0) / args.iters
    print(f"train step ({args.variant}, batch {args.batch}, crop {args.crop}, bf16): "
          f"{dt * 1e3:.1f} ms/step = {args.batch / dt:.1f} img/s")

    if args.profile:
        from hvi_cidnet_tpu.utils.profiling import op_breakdown, trace

        d = "/tmp/train_trace_r3"
        with trace(d):
            _ = float(loop(params, opt_state, low, high))
        for name, us in op_breakdown(d, top=15).items():
            print(f"  {us / 1e3:9.3f} ms  {name}")


if __name__ == "__main__":
    main()
