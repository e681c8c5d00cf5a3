"""Window H probe: can Pallas (jax 0.9 Mosaic) beat XLA's attention relayouts?

The post-HWB serving attribution (results/r5_window/pool_attrib_r5e.out)
leaves ~31 GB/fwd of pure relayout traffic around the channel-attention
einsums: XLA copies q/k/v from the free NCB view of HWCB into b-major
layout for the batched dots, then copies the output back
(attention.py:140-155 rows).  Round 3 could not attack this — Mosaic
crashed on 3-D transposes and hung on decomposed ones
(experiments/transpose_kernel_r3.py).  jax is now 0.9.0; re-probe.

Arms (per LCA level geometry, bf16, b=128):
  1. xla_t       — jnp.transpose((2,1,0)) of (N,C,B), the copy XLA pays
  2. pallas_t3   — one in-kernel 3-D transpose per block
  3. pallas_t2   — per-channel 2-D transposes (known-supported shape)
  4. dot_bcn     — in-kernel BATCHED dot (B,C,N)x(B,D,N)->(B,C,D) support
  5. site_xla    — channel_attention at current defaults (NCB einsum)
  6. site_pallas — pallas transposes + attention_bcn_pallas + transpose out

Usage: python experiments/relayout_probe_r5h.py [--levels 1 2 3]
"""

from __future__ import annotations

import argparse
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import sys

sys.path.insert(0, "/root/repo")

from hvi_cidnet_tpu.ops.attention import attention_bcn_pallas, channel_attention  # noqa: E402

# (h, w, c) per LCA level at the 400x600 bench geometry
LEVELS = {1: (200, 300, 36), 2: (100, 150, 72), 3: (50, 75, 144)}
B = 128


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
    return best * 1e3  # ms


# --- arm 2: one 3-D transpose per block -----------------------------------


def _t3_kernel(x_ref, o_ref):
    o_ref[...] = jnp.transpose(x_ref[...], (2, 1, 0))


def pallas_t3(x, n_blk):
    n, c, b = x.shape
    return pl.pallas_call(
        _t3_kernel,
        grid=(n // n_blk,),
        in_specs=[pl.BlockSpec((n_blk, c, b), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((b, c, n_blk), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, c, n), x.dtype),
    )(x)


# --- arm 3: per-channel 2-D transposes -------------------------------------


def _t2_kernel(x_ref, o_ref, *, c):
    for ci in range(c):
        o_ref[:, ci, :] = jnp.transpose(x_ref[:, ci, :], (1, 0))


def pallas_t2(x, n_blk):
    n, c, b = x.shape
    return pl.pallas_call(
        functools.partial(_t2_kernel, c=c),
        grid=(n // n_blk,),
        in_specs=[pl.BlockSpec((n_blk, c, b), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((b, c, n_blk), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, c, n), x.dtype),
    )(x)


# --- arm 4: in-kernel batched dot ------------------------------------------


def _dot_kernel(q_ref, k_ref, o_ref):
    q = q_ref[...]
    k = k_ref[...]
    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )
    o_ref[...] += s


def dot_bcn(q, k, n_blk):
    b, c, n = q.shape
    spec = pl.BlockSpec((b, c, n_blk), lambda i: (0, 0, i), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _dot_kernel,
        grid=(n // n_blk,),
        in_specs=[spec, spec],
        out_specs=pl.BlockSpec((b, c, c), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, c, c), jnp.float32),
    )(q, k)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--levels", type=int, nargs="*", default=[1, 2, 3])
    ap.add_argument("--n_blk", type=int, default=480)
    args = ap.parse_args()
    print(f"jax {jax.__version__} backend {jax.default_backend()}")

    for lvl in args.levels:
        h, w, c = LEVELS[lvl]
        n = h * w
        n_blk = args.n_blk
        while n % n_blk:
            n_blk //= 2
        rng = np.random.default_rng(lvl)
        x = jnp.asarray(rng.uniform(-1, 1, (n, c, B)), jnp.bfloat16)
        gb = 2 * x.size * 2 / 1e9  # read+write bytes
        print(f"\n== L{lvl}: N={n} C={c} B={B}  ({x.size*2/1e6:.0f} MB/tensor, n_blk={n_blk}) ==")

        xt = jax.jit(lambda t: jnp.transpose(t, (2, 1, 0)))
        ms = timeit(xt, x)
        print(f"  xla_t      {ms:7.2f} ms  {gb/ms*1e3:6.0f} GB/s")
        ref = np.asarray(xt(x))

        for name, fn in (("pallas_t3", pallas_t3), ("pallas_t2", pallas_t2)):
            try:
                f = jax.jit(functools.partial(fn, n_blk=n_blk))
                got = np.asarray(f(x))
                ok = np.array_equal(got, ref)
                ms = timeit(f, x)
                print(f"  {name:10s} {ms:7.2f} ms  {gb/ms*1e3:6.0f} GB/s  exact={ok}")
            except Exception as e:  # noqa: BLE001
                print(f"  {name:10s} FAIL: {type(e).__name__}: {str(e)[:200]}")

        # batched dot support probe (operands already b-major)
        qb = jnp.asarray(rng.uniform(-1, 1, (B, c, n)), jnp.bfloat16)
        kb = jnp.asarray(rng.uniform(-1, 1, (B, c, n)), jnp.bfloat16)
        try:
            f = jax.jit(functools.partial(dot_bcn, n_blk=n_blk))
            got = np.asarray(f(qb, kb))
            want = np.einsum(
                "bcn,bdn->bcd",
                np.asarray(qb, np.float32),
                np.asarray(kb, np.float32),
            )
            err = np.max(np.abs(got - want) / (np.abs(want).max() + 1e-9))
            ms = timeit(f, qb, kb)
            print(f"  dot_bcn    {ms:7.2f} ms  relerr={err:.2e}")
        except Exception as e:  # noqa: BLE001
            print(f"  dot_bcn    FAIL: {type(e).__name__}: {str(e)[:200]}")

        # end-to-end site: current default vs pallas-everything
        hw = (h, w)
        q4 = jnp.asarray(rng.uniform(-1, 1, (*hw, c, B)), jnp.bfloat16)
        k4 = jnp.asarray(rng.uniform(-1, 1, (*hw, c, B)), jnp.bfloat16)
        v4 = jnp.asarray(rng.uniform(-1, 1, (*hw, c, B)), jnp.bfloat16)
        heads = {36: 2, 72: 4, 144: 8}[c]
        temp = jnp.ones((heads, 1, 1), jnp.float32)
        wproj = jnp.asarray(rng.uniform(-0.2, 0.2, (1, 1, c, c)), jnp.bfloat16)

        site_xla = jax.jit(
            lambda q, k, v: channel_attention(q, k, v, temp, heads, w_proj=wproj)
        )
        ms = timeit(site_xla, q4, k4, v4)
        print(f"  site_xla   {ms:7.2f} ms")
        ref_site = np.asarray(site_xla(q4, k4, v4), np.float32)

        # ob is (B, C, N); transpose back to (N, C, B) with the same kernel
        def site_pallas2(q, k, v, n_blk=n_blk):
            qn = q.reshape(n, c, B)
            kn = k.reshape(n, c, B)
            vn = v.reshape(n, c, B)
            qb = pallas_t2(qn, n_blk)
            kb = pallas_t2(kn, n_blk)
            vb = pallas_t2(vn, n_blk)
            temp_per_c = jnp.repeat(temp.reshape(heads), c // heads)
            ob = attention_bcn_pallas(
                qb, kb, vb, temp_per_c, wproj[0, 0].astype(jnp.float32), heads,
                normalize_qk=True,
            )
            on = pallas_t2_rev(ob, n_blk)
            return on.reshape(h, w, c, B)

        try:
            f = jax.jit(site_pallas2)
            got = np.asarray(f(q4, k4, v4), np.float32)
            err = np.max(np.abs(got - ref_site)) / (np.abs(ref_site).max() + 1e-9)
            ms = timeit(f, q4, k4, v4)
            print(f"  site_plas  {ms:7.2f} ms  relerr={err:.2e}")
        except Exception as e:  # noqa: BLE001
            print(f"  site_plas  FAIL: {type(e).__name__}: {str(e)[:200]}")


def _t2r_kernel(x_ref, o_ref, *, c):
    for ci in range(c):
        o_ref[:, ci, :] = jnp.transpose(x_ref[:, ci, :], (1, 0))


def pallas_t2_rev(x, n_blk):
    """(B, C, N) -> (N, C, B)."""
    b, c, n = x.shape
    return pl.pallas_call(
        functools.partial(_t2r_kernel, c=c),
        grid=(n // n_blk,),
        in_specs=[pl.BlockSpec((b, c, n_blk), lambda i: (0, 0, i), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((n_blk, c, b), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, c, b), x.dtype),
    )(x)


if __name__ == "__main__":
    main()
