"""Can the idle MXU beat the VPU on the depthwise 3x3s?

The serving forward is dominated by depthwise-conv chains (IEL + CAB qkv),
which XLA emits as VPU fusion loops while the MXU sits idle.  A depthwise
conv is exactly a dense/grouped conv with a (block-)diagonal kernel — an
*exact* rewrite (masked weights contribute 0.0).  FLOPs inflate by the
group width g (9 -> 9g MACs/element) but land on an engine ~50x faster
per slot, so small g should win if XLA lowers grouped convs to the MXU.

Measures, per serving site geometry: XLA depthwise (groups=C), dense
masked (groups=1), and grouped masked at a few group widths.

Usage: python experiments/dw_mxu_r3.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from hvi_cidnet_tpu.ops.conv import conv2d, dwconv3x3

B = 128
# (name, h, w, c): IEL hidden widths int(2.66*dim) and CAB q/kv widths
SITES = [
    ("IEL-L1", 200, 300, 95),
    ("IEL-L2", 100, 150, 191),
    ("IEL-L3", 50, 75, 383),
    ("CAB-L1", 200, 300, 36),
    ("CAB-L2", 100, 150, 72),
    ("CAB-L3", 50, 75, 144),
]


def embed_grouped(w_dw: jnp.ndarray, c: int, g: int) -> jnp.ndarray:
    """(3,3,1,C) dw weights -> (3,3,g,C) grouped-conv weights with the dw
    taps on the within-group diagonal (exact: off-diagonal taps are 0)."""
    assert c % g == 0
    w = np.zeros((3, 3, g, c), np.float32)
    dw = np.asarray(w_dw, np.float32)
    for o in range(c):
        w[:, :, o % g, o] = dw[:, :, 0, o]
    return jnp.asarray(w)


def timeit(fn, x, w, iters=8):
    @jax.jit
    def loop(x, w):
        def body(carry, _):
            out = fn(x + carry * jnp.bfloat16(1e-6), w)
            return jnp.mean(out).astype(jnp.bfloat16), None
        final, _ = jax.lax.scan(body, jnp.bfloat16(0.0), None, length=iters)
        return final

    float(loop(x, w))
    t0 = time.perf_counter()
    float(loop(x, w))
    return (time.perf_counter() - t0) / iters * 1e3


def divisors(c):
    out = [g for g in (4, 5, 8, 16, 19, 24, 32, 48, 64) if c % g == 0]
    return out or [c]


def main():
    rng = np.random.default_rng(0)
    for name, h, w, c in SITES:
        x = jnp.asarray(rng.standard_normal((h, w, c, B)) * 0.5, jnp.bfloat16)
        w_dw = jnp.asarray(rng.standard_normal((3, 3, 1, c)) * 0.2, jnp.float32)
        t_dw = timeit(dwconv3x3, x, w_dw)
        # correctness spot-check once per site (dense)
        wd = embed_grouped(w_dw, c, c)
        ref = np.asarray(dwconv3x3(x[:8, :8], w_dw), np.float32)
        got = np.asarray(conv2d(x[:8, :8], wd, padding="SAME"), np.float32)
        assert np.allclose(ref, got, atol=1e-2), np.abs(ref - got).max()
        line = [f"{name} h{h} w{w} c{c}: dw {t_dw:.2f} ms"]
        t_dense = timeit(lambda x, wt: conv2d(x, wt, padding="SAME"), x, wd)
        line.append(f"dense {t_dense:.2f}")
        for g in divisors(c):
            wg = embed_grouped(w_dw, c, g)
            t_g = timeit(
                lambda x, wt, g=g: conv2d(x, wt, padding="SAME", groups=c // g), x, wg
            )
            line.append(f"g{g} {t_g:.2f}")
        print(", ".join(line), flush=True)


if __name__ == "__main__":
    main()
