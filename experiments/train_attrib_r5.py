"""Per-SITE attribution of the TRAIN-STEP cost pools (first ever).

The reference's primary workload is training (`/root/reference/train.py:39-90`,
north-star config 4: crop 256, batch 16, LOLv2-real recipe).  The serving
forward has had three rounds of per-site attribution (pool_attrib_r4.py) and
its levers are landed; the train step — fwd + bwd + Adam at 79.6 img/s
(BENCH_extra.json) — has only an aggregate number.  This probe runs the same
optimized-HLO-metadata x xplane-trace join as pool_attrib_r4 on the full
train step (composite loss, VGG off, exactly bench_extra's measure_train
graph) so the backward pass's relayout/fusion-tail pools get named too.

Usage:  python -u experiments/train_attrib_r5.py [--batch 16] [--crop 256]
        [--iters 4] [--top N] [--cpu]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp
import optax

from experiments.pool_attrib_r4 import POOL_PAT, hlo_metadata, shorten, traced_durations
from hvi_cidnet_tpu.models.cidnet import CIDNetConfig, init_cidnet
from hvi_cidnet_tpu.train.trainer import TrainConfig, composite_loss, make_optimizer
from hvi_cidnet_tpu.utils.profiling import trace


def build(batch: int, crop: int, iters: int):
    cfg = TrainConfig(
        model=CIDNetConfig(variant="base"),
        use_perceptual=False,
        compute_dtype="bfloat16",
    )
    params = init_cidnet(jax.random.PRNGKey(0), cfg.model)
    optimizer = make_optimizer(cfg)
    opt_state = optimizer.init(params)
    rng = np.random.default_rng(0)
    low = jnp.asarray(rng.uniform(0, 0.3, (batch, crop, crop, 3)), jnp.float32)
    high = jnp.asarray(rng.uniform(0.4, 1.0, (batch, crop, crop, 3)), jnp.float32)
    gamma = jnp.float32(1.0)

    @jax.jit
    def loop(params, opt_state, low, high):
        def body(carry, _):
            p, s, shift = carry
            (loss, aux), grads = jax.value_and_grad(composite_loss, has_aux=True)(
                p, low + shift, high, gamma, None, cfg
            )
            updates, s = optimizer.update(grads, s, p)
            p = optax.apply_updates(p, updates)
            return (p, s, loss.astype(jnp.float32) * 1e-9), None

        (p, s, shift), _ = jax.lax.scan(
            body, (params, opt_state, jnp.float32(0.0)), None, length=iters
        )
        return shift

    return loop, (params, opt_state, low, high)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--crop", type=int, default=256)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--top", type=int, default=60)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    loop, operands = build(args.batch, args.crop, args.iters)
    compiled = loop.lower(*operands).compile()
    meta = hlo_metadata(compiled.as_text())
    print(f"hlo: {len(meta)} instructions with metadata")

    _ = float(loop(*operands))  # compile + warmup
    t0 = time.perf_counter()
    _ = float(loop(*operands))
    wall = (time.perf_counter() - t0) / args.iters
    print(f"wall {wall*1e3:.1f} ms/step = {args.batch/wall:.1f} img/s")

    logdir = "/tmp/train_attrib_trace"
    with trace(logdir):
        _ = float(loop(*operands))
    durs = traced_durations(logdir)

    rows, pool_rows = [], []
    for name, us in sorted(durs.items(), key=lambda kv: -kv[1]):
        op, src = meta.get(name, ("", ""))
        row = (us / 1e3 / args.iters, name, shorten(op), src)
        rows.append(row)
        if POOL_PAT.match(name):
            pool_rows.append(row)

    def fmt(rs):
        return "\n".join(
            f"  {ms:8.2f} ms  {name:<34} {src:<18} {op}" for ms, name, op, src in rs
        )

    out = []
    out.append("\n=== attack pools (multiply_add / DUS / copy / pad / concat), ms/step ===")
    out.append(fmt(pool_rows[: args.top]))
    pool_total = sum(r[0] for r in pool_rows)
    out.append(
        f"pool total: {pool_total:.1f} ms/step "
        f"({100*pool_total*1e3*args.iters/sum(durs.values()):.1f}% of traced)"
    )
    out.append(f"\n=== all ops top {args.top} (ms/step) ===")
    out.append(fmt(rows[: args.top]))
    text = "\n".join(out)
    print(text)
    with open("/tmp/train_attrib_r5.txt", "w") as f:
        f.write(text + "\n")
    print("\nfull table -> /tmp/train_attrib_r5.txt")


if __name__ == "__main__":
    main()
