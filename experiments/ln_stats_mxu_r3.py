"""LN statistics on the MXU conv emitter instead of VPU reduces (round 3).

The serving per-op ledger attributes ~54 ms/fwd to LN stats: XLA emits
channel-LN's E[x]/E[x^2] as standalone multiply_reduce/convert_reduce
fusions (cross-sublane C reduction), which sustain ~40 GB/s effective —
while the model's 1x1 convs on identical tensors run at ~680 GB/s.  A
C->1 "ones" convolution computes the same fp32-accumulated channel sum on
the conv emitter, and the normalize-apply stays a plain elementwise op
XLA keeps fusing into consumers (the reason the full fused-LN Pallas
kernel lost end-to-end: it materialized the normalized tensor).

Arms, per LCA geometry (b=128, bf16):
  A  two-reduce baseline (ops/conv.py layer_norm_channels bf16 path)
  B  u via ones-conv (preferred f32); m2 via ones-conv over bf16(x^2)
     -- cheapest traffic, but x^2 rounded to bf16 before accumulation
  C  u via ones-conv; m2 via ones-conv over f32(x^2)
     -- numerics == baseline up to summation order; 2x m2-operand bytes
  D  u via ones-conv; m2 via the existing fused multiply_reduce
     -- partial: only replaces the convert_reduce pass

Max |Δy| vs arm A is printed for B/C (bf16 output ULP at activation scale
is ~4e-3; arm C should sit well inside that).
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from hvi_cidnet_tpu.ops.conv import layer_norm_channels

_DN = ("HWCN", "HWIO", "HWCN")
f32 = jnp.float32


def timed(fn, *args, iters=16):
    @jax.jit
    def loop(*a):
        def body(carry, _):
            y = fn(a[0] + carry.astype(a[0].dtype), *a[1:])
            return (y[0, 0, 0, 0] * 1e-20).astype(f32), None

        final, _ = jax.lax.scan(body, jnp.zeros((), f32), None, length=iters)
        return final

    _ = float(loop(*args))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        _ = float(loop(*args))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def ones_conv(x: jnp.ndarray, c: int) -> jnp.ndarray:
    """Channel mean via the conv emitter: C->1 ones kernel (exact in bf16),
    fp32 accumulation, divide by n in fp32 (1/36 is NOT bf16-exact)."""
    w = jnp.ones((1, 1, c, 1), x.dtype)
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "VALID", dimension_numbers=_DN,
        preferred_element_type=f32,
    ) / c


def ln_apply(x, u, m2, w, b, eps=1e-6):
    s = jnp.maximum(m2 - u * u, 0.0)
    scale = jax.lax.rsqrt(s + eps).astype(x.dtype)
    shift = u.astype(x.dtype)
    return w * ((x - shift) * scale) + b


def ln_a(x, w, b):
    return layer_norm_channels(x, w[0, 0, :, 0], b[0, 0, :, 0])


def ln_b(x, w, b):
    c = x.shape[2]
    u = ones_conv(x, c)
    xsq = jnp.square(x.astype(f32)).astype(x.dtype)
    m2 = ones_conv(xsq, c)
    return ln_apply(x, u, m2, w, b)


def ln_c(x, w, b):
    c = x.shape[2]
    u = ones_conv(x, c)
    xsq = jnp.square(x.astype(f32))
    m2 = ones_conv(xsq, c)
    return ln_apply(x, u, m2, w, b)


def ln_d(x, w, b):
    c = x.shape[2]
    u = ones_conv(x, c)
    m2 = jnp.sum(jnp.square(x.astype(f32)), axis=2, keepdims=True) / c
    return ln_apply(x, u, m2, w, b)


def main() -> None:
    rng = np.random.default_rng(0)
    for (h, w_, c) in [(200, 300, 36), (100, 150, 72), (50, 75, 144)]:
        x = jnp.asarray(rng.uniform(-1, 1, (h, w_, c, 128)), jnp.bfloat16)
        wt = jnp.asarray(rng.uniform(0.5, 1.5, (1, 1, c, 1)), jnp.bfloat16)
        bi = jnp.asarray(rng.uniform(-0.2, 0.2, (1, 1, c, 1)), jnp.bfloat16)

        ya = np.asarray(ln_a(x, wt, bi), np.float32)
        devs = {
            n: float(np.max(np.abs(np.asarray(f(x, wt, bi), np.float32) - ya)))
            for n, f in (("B", ln_b), ("C", ln_c), ("D", ln_d))
        }
        ts = {n: timed(f, x, wt, bi) for n, f in (("A", ln_a), ("B", ln_b), ("C", ln_c), ("D", ln_d))}
        print(
            f"L({h}x{w_}x{c}): "
            + "  ".join(f"{n} {t*1e3:.3f} ms" for n, t in ts.items())
            + "   maxdev " + "  ".join(f"{n}={devs[n]:.2e}" for n in devs)
        )


if __name__ == "__main__":
    main()
