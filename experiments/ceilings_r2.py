"""Clean hardware ceiling measurements through the tunnel.

The carry-dependency in the scan loop must not add a full-tensor pass:
perturb a single element via dynamic_update_slice instead.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp


def timed(build, iters=16, label="", work=None):
    """build(carry) -> (y, new_carry); carry is a scalar."""

    @jax.jit
    def loop():
        def body(carry, _):
            return build(carry), None

        final, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None, length=iters)
        return final

    _ = float(loop())
    t0 = time.perf_counter()
    _ = float(loop())
    dt = (time.perf_counter() - t0) / iters
    print(f"{label:45s} {dt*1e3:8.3f} ms   {work(dt) if work else ''}")
    return dt


def main():
    # --- copy bandwidth: y = x * c, c from carry (scalar broadcast) ---
    for n_mb, shape in [(128, (64, 1024, 1024)), (512, (256, 1024, 1024))]:
        x = jnp.ones(shape, jnp.bfloat16)

        def build(carry, x=x):
            y = x * (1.0 + carry * 1e-9).astype(x.dtype)
            return y[0, 0, 0].astype(jnp.float32)

        gb = 2 * x.size * 2 / 1e9
        timed(build, label=f"bf16 scale r+w {n_mb*2} MB", work=lambda dt, gb=gb: f"{gb/dt:6.0f} GB/s")

    x32 = jnp.ones((64, 1024, 1024), jnp.float32)

    def build32(carry):
        y = x32 * (1.0 + carry * 1e-9)
        return y[0, 0, 0]

    timed(build32, label="f32 scale r+w 512 MB", work=lambda dt: f"{2*x32.size*4/1e9/dt:6.0f} GB/s")

    # --- matmul TF/s: perturb one element of a via dus ---
    for m in (2048, 4096, 8192):
        a = jnp.ones((m, m), jnp.bfloat16)
        b = jnp.ones((m, m), jnp.bfloat16)

        def buildmm(carry, a=a, b=b, m=m):
            a2 = jax.lax.dynamic_update_slice(a, (carry * 1e-9).astype(jnp.bfloat16).reshape(1, 1), (0, 0))
            y = jnp.dot(a2, b)
            return y[0, 0].astype(jnp.float32)

        fl = 2 * m**3
        timed(buildmm, iters=8, label=f"bf16 matmul {m}^3", work=lambda dt, fl=fl: f"{fl/dt/1e12:6.1f} TF/s")

    # --- conv TF/s at model-like shape: dense 3x3, NHCW ---
    DN = ("NHCW", "HWIO", "NHCW")
    for (c_in, c_out, h, w, bsz) in [(36, 36, 200, 300, 32), (72, 72, 100, 150, 32), (144, 144, 50, 76, 32), (36, 95, 200, 300, 32)]:
        x = jnp.ones((bsz, h, c_in, w), jnp.bfloat16)
        wt = jnp.ones((3, 3, c_in, c_out), jnp.bfloat16) * 0.01

        def buildcv(carry, x=x, wt=wt):
            x2 = jax.lax.dynamic_update_slice(
                x, (carry * 1e-9).astype(x.dtype).reshape(1, 1, 1, 1), (0, 0, 0, 0)
            )
            y = jax.lax.conv_general_dilated(x2, wt, (1, 1), "SAME", dimension_numbers=DN)
            return y[0, 0, 0, 0].astype(jnp.float32)

        fl = 2 * 9 * c_in * c_out * h * w * bsz
        gbt = (x.size + x.size * c_out // c_in) * 2 / 1e9
        timed(
            buildcv, iters=8,
            label=f"conv3x3 {c_in}->{c_out} {h}x{w} b{bsz}",
            work=lambda dt, fl=fl, gbt=gbt: f"{fl/dt/1e12:6.1f} TF/s  {gbt/dt:6.0f} GB/s(min)",
        )


if __name__ == "__main__":
    main()
