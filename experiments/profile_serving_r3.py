"""Per-op device-time profile of the serving forward (round-3 ground truth).

The HWCB serving-contract A/B came out neutral (docs/ROUND3_NOTES.md), so
the earlier HLO attribution (HVI packing whiles ~40 ms) cannot be the
whole story.  This traces the scan-chained bench program on the real chip
and prints the measured per-op rollup, plus XLA's intended bytes for both
input layouts — the decision input for the remaining traffic/BW work.

Usage: python -u experiments/profile_serving_r3.py [nhwc|hwcb|both]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from hvi_cidnet_tpu.models.cidnet import CIDNetConfig, cidnet_forward, init_cidnet
from hvi_cidnet_tpu.utils.profiling import op_breakdown, trace

BATCH, H, W, ITERS = 128, 400, 600, 4


def build(layout: str):
    cfg = CIDNetConfig(variant="base")
    params = init_cidnet(jax.random.PRNGKey(0), cfg)
    params = {k: (v.astype(jnp.bfloat16) if v.ndim == 4 else v) for k, v in params.items()}
    shape = (BATCH, H, W, 3) if layout == "nhwc" else (H, W, 3, BATCH)
    x = jnp.asarray(np.random.default_rng(0).uniform(0, 1, shape), jnp.bfloat16)

    @jax.jit
    def loop(p, x):
        def body(carry, _):
            y = jnp.clip(
                cidnet_forward(p, x + carry, cfg, compute_dtype=jnp.bfloat16, input_layout=layout),
                0,
                1,
            )
            return (jnp.mean(y) * jnp.bfloat16(1e-8)).astype(jnp.bfloat16), None

        final, _ = jax.lax.scan(body, jnp.bfloat16(0.0), None, length=ITERS)
        return final

    return loop, params, x


def profile(layout: str) -> None:
    loop, params, x = build(layout)
    lowered = loop.lower(params, x)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    print(f"\n=== {layout}: bytes {ca.get('bytes accessed', 0)/1e9/ITERS:.1f} GB/fwd, "
          f"flops {ca.get('flops', 0)/1e12/ITERS:.2f} TF/fwd ===")
    _ = float(loop(params, x))  # warm
    t0 = time.perf_counter()
    _ = float(loop(params, x))
    wall = (time.perf_counter() - t0) / ITERS
    print(f"wall {wall*1e3:.1f} ms/fwd = {BATCH/wall:.1f} img/s")

    logdir = f"/tmp/prof_{layout}"
    with trace(logdir):
        _ = float(loop(params, x))
    agg = op_breakdown(logdir, top=34)
    tot = sum(agg.values())
    print(f"traced device total {tot/1e3/ITERS:.1f} ms/fwd; top ops (ms/fwd, % of traced):")
    for name, us in agg.items():
        print(f"  {us/1e3/ITERS:8.2f}  {100*us/tot:5.1f}%  {name}")


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    for layout in (("nhwc", "hwcb") if which == "both" else (which,)):
        profile(layout)


if __name__ == "__main__":
    main()
