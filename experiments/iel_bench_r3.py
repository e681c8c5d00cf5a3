"""Standalone A/B of the fused IEL-branch kernel vs the XLA twin, per level.

Serving geometry (600x400, batch 128, bf16, HWCB): LCA/IEL sites live at
L1 (200,300,c96), L2 (100,150,c191), L3 (50,75,c383) — hidden widths are
int(2.66*dim).  Usage:  python experiments/iel_bench_r3.py [th ct]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import hvi_cidnet_tpu.ops.iel_pallas as ip

LEVELS = [
    ("L1", 200, 300, 96),
    ("L2", 100, 152, 191),  # W padded to even for the microbench
    ("L3", 50, 76, 383),
]
B = 128


def timeit(branch_fn, y, w1, w2, iters=8):
    """Scan-chained in-jit timing with a scalar host fetch (the only
    reliable completion barrier through the tunnel — see bench.py)."""

    @jax.jit
    def loop(y, w1, w2):
        def body(c, _):
            out = branch_fn(y + c * jnp.bfloat16(1e-6), w1, w2)
            return jnp.mean(out).astype(jnp.bfloat16), None
        final, _ = jax.lax.scan(body, jnp.bfloat16(0.0), None, length=iters)
        return final

    float(loop(y, w1, w2))  # compile + warmup
    t0 = time.perf_counter()
    float(loop(y, w1, w2))
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    force = None
    if len(sys.argv) == 3:
        force = (int(sys.argv[1]), int(sys.argv[2]))
        real_pick = ip._pick_tiles
        ip._pick_tiles = lambda *a, **k: force
    rng = np.random.default_rng(0)
    for name, h, w, c in LEVELS:
        y = jnp.asarray(rng.standard_normal((h, w, c, B)) * 0.5, jnp.bfloat16)
        w1 = jnp.asarray(rng.standard_normal((3, 3, 1, c)) * 0.2, jnp.float32)
        w2 = jnp.asarray(rng.standard_normal((3, 3, 1, c)) * 0.2, jnp.float32)
        tiles = ip._pick_tiles(h, w, c, B, 2)
        t_x = timeit(ip._xla_branch, y, w1, w2)
        try:
            t_k = timeit(lambda y, w1, w2: ip.iel_branch_pallas(y, w1, w2), y, w1, w2)
        except Exception as e:  # noqa: BLE001
            print(f"{name} h{h} w{w} c{c} tiles={tiles}: XLA {t_x:.2f} ms, kernel FAILED {type(e).__name__}: {str(e)[:160]}")
            continue
        print(f"{name} h{h} w{w} c{c} tiles={tiles}: XLA {t_x:.2f} ms, kernel {t_k:.2f} ms ({t_x / t_k:.2f}x)")


if __name__ == "__main__":
    main()
