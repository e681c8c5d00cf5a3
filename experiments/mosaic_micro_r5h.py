"""Window H micro-probe: do jax-0.9 Mosaic kernels support the two ops the
fused NCB attention kernel needs?

  1. in-VMEM 3-D transpose  (n_blk, C, B) -> (B, C, n_blk)
     (round-3 Mosaic crashed on this — experiments/transpose_kernel_r3.py)
  2. in-kernel BATCHED dot_general  (B,C,n)x(B,D,n) -> (B,C,D)

Block specs here keep the last two block dims equal to the full array dims,
which is always legal (the r5h relayout probe failed only because it blocked
the OUTPUT's last dim by a non-multiple of 128).
"""

from __future__ import annotations

import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

C, B = 36, 128


def timeit(fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e3


# --- 1. blocked 3-D transpose: (N,C,B) -> (G,B,C,n_blk) ---------------------


def _t3_kernel(x_ref, o_ref):
    o_ref[0] = jnp.transpose(x_ref[...], (2, 1, 0))


def t3_blocked(x, n_blk):
    n, c, b = x.shape
    g = n // n_blk
    return pl.pallas_call(
        _t3_kernel,
        grid=(g,),
        in_specs=[pl.BlockSpec((n_blk, c, b), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, b, c, n_blk), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((g, b, c, n_blk), x.dtype),
    )(x)


# --- 1b. decomposed: per-channel 2-D transposes ------------------------------


def _t2_kernel(x_ref, o_ref, *, c):
    for ci in range(c):
        o_ref[0, :, ci, :] = jnp.transpose(x_ref[:, ci, :], (1, 0))


def t2_blocked(x, n_blk):
    n, c, b = x.shape
    g = n // n_blk
    return pl.pallas_call(
        functools.partial(_t2_kernel, c=c),
        grid=(g,),
        in_specs=[pl.BlockSpec((n_blk, c, b), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, b, c, n_blk), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((g, b, c, n_blk), x.dtype),
    )(x)


# --- 1c. 2-D transpose via free reshapes: (n_blk,C,B) ~ (n_blk*C, B) ----------
# A leading-dims merge is layout-free, so the relayout reduces to ONE classic
# 2-D transpose per block; (B, n_blk*C) then splits freely into (B, n_blk, C),
# a b-major layout the attention kernel could consume with 2-D dots only.


def _pack_kernel(x_ref, o_ref, *, n_blk, c, b):
    x2 = x_ref[...].reshape(n_blk * c, b)
    t = jnp.transpose(x2, (1, 0))
    o_ref[0] = t.reshape(b, n_blk, c)


def pack_blocked(x, n_blk):
    n, c, b = x.shape
    g = n // n_blk
    return pl.pallas_call(
        functools.partial(_pack_kernel, n_blk=n_blk, c=c, b=b),
        grid=(g,),
        in_specs=[pl.BlockSpec((n_blk, c, b), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, b, n_blk, c), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((g, b, n_blk, c), x.dtype),
    )(x)


# --- 2. in-kernel batched dot -------------------------------------------------


def _bdot_kernel(q_ref, k_ref, o_ref):
    s = jax.lax.dot_general(
        q_ref[...], k_ref[...], (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    o_ref[...] = s


def bdot(q, k):
    b, c, n = q.shape
    spec = pl.BlockSpec((b, c, n), lambda: (0, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _bdot_kernel,
        in_specs=[spec, spec],
        out_specs=pl.BlockSpec((b, c, c), lambda: (0, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, c, c), jnp.float32),
    )(q, k)


def main():
    print(f"jax {jax.__version__} backend {jax.default_backend()}")
    rng = np.random.default_rng(0)
    n, n_blk = 60000, 1000
    x = jnp.asarray(rng.uniform(-1, 1, (n, C, B)), jnp.bfloat16)
    want = np.transpose(np.asarray(x), (2, 1, 0)).reshape(B, C, n // n_blk, n_blk)
    want = np.transpose(want, (2, 0, 1, 3))  # (G,B,C,n_blk)
    gb = 2 * x.size * 2 / 1e9

    for name, fn in (("t3_blocked", t3_blocked), ("t2_blocked", t2_blocked)):
        try:
            f = jax.jit(functools.partial(fn, n_blk=n_blk))
            got = np.asarray(f(x))
            ok = np.array_equal(got, want)
            ms = timeit(f, x)
            print(f"  {name:11s} {ms:7.2f} ms  {gb/ms*1e3:6.0f} GB/s  exact={ok}")
        except Exception as e:  # noqa: BLE001
            print(f"  {name:11s} FAIL: {type(e).__name__}: {str(e)[:160]}")

    # batched dot at a single-block geometry
    nb = 512
    q = jnp.asarray(rng.uniform(-1, 1, (B, C, nb)), jnp.bfloat16)
    k = jnp.asarray(rng.uniform(-1, 1, (B, C, nb)), jnp.bfloat16)
    try:
        f = jax.jit(bdot)
        got = np.asarray(f(q, k))
        want2 = np.einsum("bcn,bdn->bcd", np.asarray(q, np.float32), np.asarray(k, np.float32))
        err = np.max(np.abs(got - want2)) / (np.abs(want2).max() + 1e-9)
        ms = timeit(f, q, k)
        print(f"  bdot        {ms:7.2f} ms  relerr={err:.2e}")
    except Exception as e:  # noqa: BLE001
        print(f"  bdot        FAIL: {type(e).__name__}: {str(e)[:160]}")


if __name__ == "__main__":
    main()
