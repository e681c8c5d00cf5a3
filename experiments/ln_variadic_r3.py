"""LN stats in ONE input pass via variadic lax.reduce (round-3 probe).

The serving profile shows the LN pool as two separate full-tensor input
passes: multiply_reduce_fusion (sum of x^2) ~31 ms + convert_reduce_fusion
(sum of x) ~28 ms per forward.  A variadic reduce computes both moments in
a single traversal; x^2 fuses into the reduce input, so the pass reads x
once.  If XLA honors the fusion this halves LN-stats traffic (~-25 ms).

A/B at the three LCA geometries + end-to-end hook via conv.py twiddle.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

CH_AXIS = 2


def timed(fn, *args, iters=16):
    @jax.jit
    def loop(*a):
        def body(carry, _):
            y = fn(a[0] + carry.astype(a[0].dtype), *a[1:])
            return (y[0][0, 0, 0, 0] * 1e-20).astype(jnp.float32), None

        final, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None, length=iters)
        return final

    _ = float(loop(*args))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        _ = float(loop(*args))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def stats_two_pass(x):
    n = x.shape[CH_AXIS]
    u = jnp.sum(x, axis=CH_AXIS, keepdims=True, dtype=jnp.float32) / n
    m2 = jnp.sum(jnp.square(x.astype(jnp.float32)), axis=CH_AXIS, keepdims=True) / n
    return u, m2


def stats_variadic(x):
    n = x.shape[CH_AXIS]
    xf = x.astype(jnp.float32)
    s, s2 = jax.lax.reduce(
        (xf, xf * xf),
        (jnp.float32(0), jnp.float32(0)),
        lambda a, b: (a[0] + b[0], a[1] + b[1]),
        (CH_AXIS,),
    )
    u = jnp.expand_dims(s, CH_AXIS) / n
    m2 = jnp.expand_dims(s2, CH_AXIS) / n
    return u, m2


def apply_ln(x, u, m2, w, b, eps=1e-6):
    s = jnp.maximum(m2 - u * u, 0.0)
    scale = jax.lax.rsqrt(s + eps).astype(x.dtype)
    shift = u.astype(x.dtype)
    return w * ((x - shift) * scale) + b


def main() -> None:
    rng = np.random.default_rng(0)
    for (h, w_, c) in [(200, 300, 36), (100, 150, 72), (50, 75, 144)]:
        x = jnp.asarray(rng.uniform(-1, 1, (h, w_, c, 128)), jnp.bfloat16)
        wt = jnp.ones((1, 1, c, 1), jnp.bfloat16)
        bi = jnp.zeros((1, 1, c, 1), jnp.bfloat16)

        def ln2(x):
            u, m2 = stats_two_pass(x)
            return (apply_ln(x, u, m2, wt, bi),)

        def lnv(x):
            u, m2 = stats_variadic(x)
            return (apply_ln(x, u, m2, wt, bi),)

        a = jnp.allclose(ln2(x)[0].astype(jnp.float32), lnv(x)[0].astype(jnp.float32), atol=1e-2)
        t2 = timed(ln2, x)
        tv = timed(lnv, x)
        print(f"L({h}x{w_}x{c}): two-pass {t2*1e3:.3f} ms  variadic {tv*1e3:.3f} ms  close={a}")


if __name__ == "__main__":
    main()
