"""Ceilings, take 2: consume the full output (sum-reduce) so XLA can't DCE,
and measure the empty-iteration floor explicitly."""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp


def timed(body, iters=16, label="", work=None):
    @jax.jit
    def loop():
        final, _ = jax.lax.scan(lambda c, _: (body(c), None), jnp.zeros((), jnp.float32), None, length=iters)
        return final

    _ = float(loop())
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        _ = float(loop())
        best = min(best, (time.perf_counter() - t0) / iters)
    print(f"{label:45s} {best*1e3:8.3f} ms   {work(best) if work else ''}")
    return best


def main():
    # empty iteration floor
    timed(lambda c: c + 1.0, label="empty iteration (scalar add)")

    x_small = jnp.ones((16, 1024, 1024), jnp.bfloat16)  # 32 MB
    timed(
        lambda c: jnp.sum((x_small * (1 + c * 1e-9).astype(jnp.bfloat16)).astype(jnp.float32)),
        label="bf16 scale+sum 32 MB",
        work=lambda dt: f"{2*x_small.size*2/1e9/dt:6.0f} GB/s(r+w acct)",
    )

    for mb, shape in [(128, (64, 1024, 1024)), (512, (256, 1024, 1024)), (1024, (512, 1024, 1024))]:
        x = jnp.ones(shape, jnp.bfloat16)
        timed(
            lambda c, x=x: jnp.sum((x * (1 + c * 1e-9).astype(jnp.bfloat16)).astype(jnp.float32)),
            label=f"bf16 scale+sum {mb} MB",
            work=lambda dt, x=x: f"{2*x.size*2/1e9/dt:6.0f} GB/s(r+w acct)",
        )

    # pure read: sum only (read 1 pass, no write)
    xr = jnp.ones((256, 1024, 1024), jnp.bfloat16)
    timed(
        lambda c: jnp.sum(xr.astype(jnp.float32)) + c * 0,
        label="bf16 sum-only 512 MB [may hoist!]",
        work=lambda dt: f"{xr.size*2/1e9/dt:6.0f} GB/s(read)",
    )
    timed(
        lambda c: jnp.sum((xr + (c * 1e-9).astype(jnp.bfloat16)).astype(jnp.float32)),
        label="bf16 add-scalar+sum 512 MB (read-dom)",
        work=lambda dt: f"{xr.size*2/1e9/dt:6.0f} GB/s(read acct)",
    )

    # matmul with full consumption
    for m in (2048, 4096, 8192):
        a = jnp.ones((m, m), jnp.bfloat16) * 0.001
        b = jnp.ones((m, m), jnp.bfloat16) * 0.001

        def bodymm(c, a=a, b=b):
            a2 = jax.lax.dynamic_update_slice(a, (c * 1e-9).astype(jnp.bfloat16).reshape(1, 1), (0, 0))
            y = jnp.dot(a2, b)
            return jnp.sum(y.astype(jnp.float32)) * 1e-9

        fl = 2 * m**3
        timed(bodymm, iters=8, label=f"bf16 matmul {m}^3 (+sum)", work=lambda dt, fl=fl: f"{fl/dt/1e12:6.1f} TF/s")

    # conv with full consumption
    DN = ("NHCW", "HWIO", "NHCW")
    for (c_in, c_out, h, w, bsz) in [(36, 36, 200, 300, 128), (36, 95, 200, 300, 128), (144, 144, 50, 76, 128)]:
        x = jnp.ones((bsz, h, c_in, w), jnp.bfloat16)
        wt = jnp.ones((3, 3, c_in, c_out), jnp.bfloat16) * 0.01

        def buildcv(c, x=x, wt=wt):
            x2 = jax.lax.dynamic_update_slice(
                x, (c * 1e-9).astype(x.dtype).reshape(1, 1, 1, 1), (0, 0, 0, 0)
            )
            y = jax.lax.conv_general_dilated(x2, wt, (1, 1), "SAME", dimension_numbers=DN)
            return jnp.sum(y.astype(jnp.float32)) * 1e-9

        fl = 2 * 9 * c_in * c_out * h * w * bsz
        timed(
            buildcv, iters=8,
            label=f"conv3x3 {c_in}->{c_out} {h}x{w} b{bsz} (+sum)",
            work=lambda dt, fl=fl: f"{fl/dt/1e12:6.1f} TF/s",
        )


if __name__ == "__main__":
    main()
