#!/usr/bin/env python
"""Model smoke/bench — twin of the reference ``net_test.py:1-21``.

Prints param count, single-forward wall time (properly synchronized, unlike
the reference's pre-sync timing quirk), and FLOPs from XLA's own cost
analysis instead of thop hooks.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from hvi_cidnet_tpu.models.cidnet import CIDNetConfig, cidnet_forward, count_params, init_cidnet

p = argparse.ArgumentParser()
p.add_argument("--variant", type=str, default="base", choices=["base", "mssa", "tnsm"])
p.add_argument("--size", type=int, default=256)
p.add_argument("--batch", type=int, default=1)
p.add_argument("--dtype", type=str, default="float32", choices=["float32", "bfloat16"])
p.add_argument("--iters", type=int, default=10)
from hvi_cidnet_tpu.utils.compile_cache import add_compile_cache_flag, enable_compilation_cache  # noqa: E402

add_compile_cache_flag(p)
args = p.parse_args()
enable_compilation_cache(args.compile_cache)

cfg = CIDNetConfig(variant=args.variant)
params = init_cidnet(jax.random.PRNGKey(0), cfg)
dt = jnp.dtype(args.dtype)
if dt == jnp.bfloat16:
    params = {k: (v.astype(dt) if v.ndim == 4 else v) for k, v in params.items()}
x = jnp.asarray(np.random.rand(args.batch, 3, args.size, args.size).transpose(0, 2, 3, 1), dt)

fwd = jax.jit(lambda p_, x_: cidnet_forward(p_, x_, cfg, compute_dtype=dt))
lowered = fwd.lower(params, x)
compiled = lowered.compile()
cost = compiled.cost_analysis()
flops = cost.get("flops", float("nan")) if cost else float("nan")

# scalar host fetch = reliable completion barrier (block_until_ready can
# return early through the remote-TPU tunnel)
_ = float(jnp.sum(fwd(params, x)))  # warmup
t0 = time.perf_counter()
for _ in range(args.iters):
    out = fwd(params, x)
_ = float(jnp.sum(out))
dt_s = (time.perf_counter() - t0) / args.iters

n_param = count_params(params)
print(f"Time: {dt_s:.6f} s/forward ({args.batch}x3x{args.size}x{args.size}, {args.dtype})")
print(f"n_paras: {n_param / 2**20}M ({n_param:,})")
print(f"FLOPs: {flops / 2**30:.4f}G (XLA cost analysis, per forward)")
print(f"throughput: {args.batch / dt_s:.1f} img/s")
