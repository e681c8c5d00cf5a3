#!/usr/bin/env python
"""Round-over-round perf tracking for the NON-headline graphs.

bench.py tracks the headline (base-variant serving).  This sibling measures
the other three first-class graphs in ONE chip window — same-window numbers
are the only comparable kind on the tunneled chip (~10% drift between
windows) — and writes them to ``BENCH_extra.json`` (one JSON object per
line), so regressions in mssa/tnsm serving and the train step become visible
round-over-round (VERDICT r3 weak #6).  Reference twins:
``net/CIDNet_MSSA.py``, ``net/CIDNet_TNSM.py``, ``train.py:39-90`` (the
LOLv2-real recipe = north-star train config: crop 256, batch 16, bf16).

Each graph runs in a fresh child interpreter under bench.py's bounded retry
loop (the same backend-outage resilience contract).

Usage: python bench_extra.py [--out BENCH_extra.json]
       python bench_extra.py --once --graph mssa     # child mode
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench import retry_loop, run_attempt  # noqa: E402

GRAPHS = ("base", "mssa", "tnsm", "train", "fullres_b1", "fullres_b8")
# same geometry-override knobs as bench.py (and tiny-CPU smoke tests)
H = int(os.environ.get("BENCH_H", "400"))
W = int(os.environ.get("BENCH_W", "600"))
BATCH = int(os.environ.get("BENCH_BATCH", "128"))
ITERS = int(os.environ.get("BENCH_ITERS", "8"))
TRAIN_CROP = int(os.environ.get("BENCH_TRAIN_CROP", "256"))
TRAIN_BATCH = int(os.environ.get("BENCH_TRAIN_BATCH", "16"))
# north stars: serving vs the base-variant target (BASELINE.json); train vs
# the round-3 measured 77 img/s (207 ms/step) as the regression baseline
SERVE_TARGET = 1500.0
TRAIN_BASELINE = 77.0


def measure_serving(variant: str, *, h: int = None, w: int = None, batch: int = None, min_batch: int = 16) -> dict:
    """Serving throughput at the headline geometry; on HBM OOM the batch
    halves (floor ``min_batch``) and the metric label records the reduced
    geometry — tnsm materializes 12 full-res noise maps the base graph
    doesn't, and a lost measurement is worse than a smaller-batch one."""
    batch = BATCH if batch is None else batch
    while True:
        try:
            return _measure_serving_at(variant, batch, h=h, w=w)
        except Exception as e:
            if "RESOURCE_EXHAUSTED" in str(e) and batch > min_batch:
                print(
                    f"bench_extra: {variant} OOM at batch {batch}; retrying "
                    f"at {batch // 2}", file=sys.stderr,
                )
                batch //= 2
                continue
            raise


def _measure_serving_at(variant: str, batch: int, *, h: int = None, w: int = None) -> dict:
    import numpy as np
    import jax
    import jax.numpy as jnp

    from hvi_cidnet_tpu.models.cidnet import CIDNetConfig, cidnet_forward, init_cidnet

    h = H if h is None else h
    w = W if w is None else w
    cfg = CIDNetConfig(variant=variant)
    params = init_cidnet(jax.random.PRNGKey(0), cfg)
    params = {k: (v.astype(jnp.bfloat16) if v.ndim == 4 else v) for k, v in params.items()}
    x = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (batch, h, w, 3)), jnp.bfloat16)

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

    # phase breadcrumbs feed the parent's idle watchdog (bench.run_attempt)
    print(f"bench_extra: {variant} compiling (batch {batch})", file=sys.stderr, flush=True)
    _ = float(loop(params, x))  # compile + warmup
    print(f"bench_extra: {variant} measuring", file=sys.stderr, flush=True)
    best = 0.0
    for _ in range(2):
        t0 = time.perf_counter()
        _ = float(loop(params, x))
        best = max(best, batch * ITERS / (time.perf_counter() - t0))
    if (h, w) == (H, W):
        geom = "" if batch == BATCH else f", batch {batch} after OOM fallback"
        target = SERVE_TARGET
    else:
        # non-headline geometry (the full-res LOL-Blur/SID 1280x720 arm,
        # /root/reference/eval_SID_blur.py:44-73): compare against the
        # pixel-rate-equivalent of the 600x400 north star
        geom = f", batch {batch}"
        target = SERVE_TARGET * (H * W) / (h * w)
    return {
        "metric": f"{w}x{h} images/sec/chip (bf16 {variant} serving{geom})",
        "value": round(best, 2),
        "unit": "img/s",
        "vs_baseline": round(best / target, 4),
    }


def measure_train() -> dict:
    import numpy as np
    import jax
    import jax.numpy as jnp
    import optax

    from hvi_cidnet_tpu.models.cidnet import CIDNetConfig, init_cidnet
    from hvi_cidnet_tpu.train.trainer import TrainConfig, composite_loss, make_optimizer

    cfg = TrainConfig(
        model=CIDNetConfig(variant="base"),
        use_perceptual=False,
        compute_dtype="bfloat16",
    )
    params = init_cidnet(jax.random.PRNGKey(0), cfg.model)
    optimizer = make_optimizer(cfg)
    opt_state = optimizer.init(params)
    rng = np.random.default_rng(0)
    low = jnp.asarray(rng.uniform(0, 0.3, (TRAIN_BATCH, TRAIN_CROP, TRAIN_CROP, 3)), jnp.float32)
    high = jnp.asarray(rng.uniform(0.4, 1.0, (TRAIN_BATCH, TRAIN_CROP, TRAIN_CROP, 3)), jnp.float32)
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
            body, (params, opt_state, jnp.float32(0.0)), None, length=ITERS
        )
        return shift

    print("bench_extra: train compiling", file=sys.stderr, flush=True)
    _ = float(loop(params, opt_state, low, high))  # compile + warmup
    print("bench_extra: train measuring", file=sys.stderr, flush=True)
    best = 0.0
    for _ in range(2):
        t0 = time.perf_counter()
        _ = float(loop(params, opt_state, low, high))
        best = max(best, TRAIN_BATCH * ITERS / (time.perf_counter() - t0))
    return {
        "metric": "256x256 images/sec/chip (bf16 train step, batch 16, north-star config 4)",
        "value": round(best, 2),
        "unit": "img/s",
        "vs_baseline": round(best / TRAIN_BASELINE, 4),
    }


def measure(graph: str) -> dict:
    # liveness heartbeat + persistent compile cache, same contract as
    # bench.measure (slow tunnel compiles must not trip the idle watchdog;
    # an attempt that dies after compiling leaves the next one a cache hit)
    from bench import start_heartbeat

    start_heartbeat({"name": f"graph:{graph}"})
    from hvi_cidnet_tpu.utils.compile_cache import enable_compilation_cache

    cache = enable_compilation_cache()
    if cache:
        print(f"bench_extra: compile cache at {cache}", file=sys.stderr, flush=True)
    if graph == "train":
        return measure_train()
    if graph.startswith("fullres"):
        # full-res serving evidence at the LOL-Blur geometry (BASELINE
        # config 3; /root/reference/eval_SID_blur.py:44-73): b=1 is the
        # reference's one-image-per-forward evaluator, b=8 the batched arm
        return measure_serving(
            "base", h=720, w=1280, batch=int(graph.rsplit("_b", 1)[1]), min_batch=1
        )
    return measure_serving(graph)


def run_child(graph: str, timeout: float):
    """One child attempt, sharing bench.py's subprocess/timeout handling."""
    return run_attempt(
        timeout, script=os.path.abspath(__file__), extra=["--graph", graph]
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--once", action="store_true")
    ap.add_argument("--graph", choices=GRAPHS, default="base")
    ap.add_argument("--out", default="BENCH_extra.json")
    args = ap.parse_args()
    if args.once:
        print(json.dumps(measure(args.graph)))
        return
    # Per-graph retry arithmetic mirrors bench.py: the attempt timeout must
    # be SMALLER than the budget or one hung attempt exhausts it with zero
    # retries (the round-3 failure).  Per-graph budget is a quarter of
    # bench.py's so the whole 4-graph sweep stays under the runner's window.
    budget = float(os.environ.get("BENCH_RETRY_SECONDS", "450"))
    timeout = float(os.environ.get("BENCH_ATTEMPT_TIMEOUT", "400"))
    results, failed = [], 0
    for graph in GRAPHS:
        # one failed graph must not discard the window's other measurements
        # (the artifact-lost failure mode this file exists to prevent):
        # retry_loop prints its structured error line and raises; catch,
        # record the failure in the artifact, continue with the next graph
        try:
            result = retry_loop(
                lambda g=graph: run_child(g, timeout),
                budget,
                base_delay=float(os.environ.get("BENCH_BASE_DELAY", "5")),
                metric=f"graph:{graph}",
            )
        except SystemExit:
            failed += 1
            result = {"metric": f"graph:{graph}", "error": "measurement failed"}
        results.append(result)
        print(json.dumps(result), flush=True)
    with open(args.out, "w") as f:
        for r in results:
            f.write(json.dumps(r) + "\n")
    print(f"wrote {args.out} ({failed} of {len(GRAPHS)} graphs failed)", file=sys.stderr)
    if failed:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
