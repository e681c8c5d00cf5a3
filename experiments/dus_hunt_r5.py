"""Round-5: name the DUS pool (VERDICT r4 #2, docs/PERF_CEILING.md §2).

The per-site attribution (pool_attrib_r4) shows ~18 ms/fwd of
dynamic-update-slice + dynamic-slice_reduce ops with NO named scope —
they belong to program plumbing, not a model block.  This dumps the
optimized HLO of the exact bench program and prints every
dynamic-update-slice / dynamic-slice instruction with its shape and
metadata so the pool can be attacked (or written off as scan machinery).

Usage: python experiments/dus_hunt_r5.py   (TPU window required)
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from hvi_cidnet_tpu.models.cidnet import CIDNetConfig, cidnet_forward, init_cidnet

H, W, BATCH, ITERS = 400, 600, 128, 8


def main() -> None:
    cfg = CIDNetConfig(variant="base")
    params = init_cidnet(jax.random.PRNGKey(0), cfg)
    params = {k: (v.astype(jnp.bfloat16) if v.ndim == 4 else v) for k, v in params.items()}
    x = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (BATCH, H, W, 3)), jnp.bfloat16)

    def one(p, xx):
        return jnp.clip(cidnet_forward(p, xx, cfg, compute_dtype=jnp.bfloat16), 0, 1)

    @jax.jit
    def loop(p, xx):
        def body(carry, _):
            y = one(p, xx + carry * jnp.bfloat16(1e-6))
            return jnp.mean(y).astype(jnp.bfloat16), None

        final, _ = jax.lax.scan(body, jnp.bfloat16(0.0), None, length=ITERS)
        return final

    print("lowering + compiling bench program ...", file=sys.stderr, flush=True)
    compiled = loop.lower(params, x).compile()
    hlo = compiled.as_text()
    out_path = os.environ.get("DUS_HLO_OUT", "/tmp/bench_hlo_r5.txt")
    with open(out_path, "w") as f:
        f.write(hlo)
    print(f"optimized HLO -> {out_path} ({len(hlo)} bytes)", file=sys.stderr)

    pat = re.compile(r"^\s*(\S+) = (\S+) (dynamic-update-slice|dynamic-slice)\((.*)$")
    n = 0
    for line in hlo.splitlines():
        m = pat.match(line)
        if m:
            n += 1
            name, shape, kind, rest = m.groups()
            meta = ""
            mm = re.search(r'metadata=\{(.*?)\}', line)
            if mm:
                meta = mm.group(1)[:160]
            print(f"{kind:22s} {shape:28s} {name:28s} {meta}")
    # fusions whose *name* carries dynamic-slice (the attributed pool entries)
    for line in hlo.splitlines():
        if re.search(r"dynamic-slice\S*_fusion|_dus_fusion", line) and " = " in line:
            print("FUSED:", line.strip()[:240])
    print(f"total dynamic-slice-ish instructions: {n}")


if __name__ == "__main__":
    main()
