"""XLA-flag sweep at serving geometry: does any TPU compiler knob move the
bench number?

Every candidate set runs in a fresh subprocess (XLA_FLAGS is read at
backend init), timing the same scan-chained forward as bench.py with
fewer iters.  The base set re-runs first and last to bracket tunnel
drift.  Usage: python experiments/xla_flags_r3.py
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

CANDIDATES = [
    ("base", ""),
    ("vmem32m", "--xla_tpu_scoped_vmem_limit_kib=32768"),
    ("vmem64m", "--xla_tpu_scoped_vmem_limit_kib=65536"),
    ("no_rwb", "--xla_tpu_rwb_fusion=false"),
    ("no_dot_sr", "--xla_tpu_enable_dot_strength_reduction=false"),
    ("flm_opt", "--xla_tpu_use_enhanced_scheduling_for_flm=true"),
    ("async_fusion", "--xla_tpu_enable_async_collective_fusion=true"),
    ("base2", ""),
]

CHILD = r"""
import os, sys, time, json
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from hvi_cidnet_tpu.models.cidnet import CIDNetConfig, cidnet_forward, init_cidnet

batch, iters = 128, 4
cfg = CIDNetConfig(variant="base")
params = init_cidnet(jax.random.PRNGKey(0), cfg)
params = {k: (v.astype(jnp.bfloat16) if v.ndim == 4 else v) for k, v in params.items()}
x = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (batch, 400, 600, 3)), jnp.bfloat16)

@jax.jit
def loop(p, x):
    def body(carry, _):
        y = jnp.clip(cidnet_forward(p, x + carry * jnp.bfloat16(1e-6), cfg, compute_dtype=jnp.bfloat16), 0, 1)
        return jnp.mean(y).astype(jnp.bfloat16), None
    final, _ = jax.lax.scan(body, jnp.bfloat16(0.0), None, length=iters)
    return final

_ = float(loop(params, x))
best = 1e9
for _ in range(3):
    t0 = time.perf_counter()
    _ = float(loop(params, x))
    best = min(best, (time.perf_counter() - t0) / iters)
print(json.dumps({"ms": best * 1e3, "imgs": batch / best}))
"""


def main() -> None:
    results = {}
    for name, flags in CANDIDATES:
        env = dict(os.environ)
        if flags:
            env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") + " " + flags).strip()
        r = subprocess.run(
            [sys.executable, "-c", CHILD], env=env, capture_output=True, text=True, timeout=1200
        )
        line = r.stdout.strip().splitlines()[-1] if r.stdout.strip() else ""
        try:
            results[name] = json.loads(line)
            print(f"{name:14s} {flags:50s} {results[name]['imgs']:.1f} img/s")
        except json.JSONDecodeError:
            err = (r.stderr or "").strip().splitlines()
            print(f"{name:14s} {flags:50s} FAILED: {err[-1] if err else 'no output'}")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
