"""HBM-traffic ceiling audit for the serving forward (go/no-go input for
the class-split flat-layout pilot, VERDICT r2 item 2).

Reads XLA's own post-fusion cost analysis of the bench program: total
bytes accessed ~= the traffic XLA's schedule intends, which against the
measured wall time and the chip's ~819 GB/s HBM says whether the forward
is already bandwidth-saturated (=> only traffic *reduction* can win, not
better kernels for the same passes).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from hvi_cidnet_tpu.models.cidnet import CIDNetConfig, cidnet_forward, init_cidnet


def main() -> None:
    batch = int(os.environ.get("BENCH_BATCH", "128"))
    cfg = CIDNetConfig(variant="base")
    params = init_cidnet(jax.random.PRNGKey(0), cfg)
    params = {k: (v.astype(jnp.bfloat16) if v.ndim == 4 else v) for k, v in params.items()}
    x = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (batch, 400, 600, 3)), jnp.bfloat16)

    def fwd(p, x):
        return jnp.clip(cidnet_forward(p, x, cfg, compute_dtype=jnp.bfloat16), 0, 1)

    lowered = jax.jit(fwd).lower(params, x)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    bytes_total = ca.get("bytes accessed", float("nan"))
    flops = ca.get("flops", float("nan"))
    print(f"bytes accessed (XLA cost analysis): {bytes_total/1e9:.1f} GB")
    print(f"flops: {flops/1e12:.2f} TFLOP")

    jfwd = jax.jit(fwd)
    y = jfwd(params, x)
    _ = float(jnp.mean(y.astype(jnp.float32)))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        y = jfwd(params, x)
        _ = float(jnp.mean(y.astype(jnp.float32)))
        best = min(best, time.perf_counter() - t0)
    # single-dispatch timing carries tunnel overhead; report both
    print(f"wall/fwd (single dispatch, min of 3): {best*1e3:.1f} ms")
    print(f"implied BW if memory-bound: {bytes_total/best/1e9:.0f} GB/s (chip ~819)")
    print(f"implied TF/s: {flops/best/1e12:.1f} (chip ~197 bf16)")


if __name__ == "__main__":
    main()
