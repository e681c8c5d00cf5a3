"""Round-3 de-risking probe: per-batch channel-attention Pallas kernel.

The remaining ~10.8 GB/fwd of copies feed the attention dot_generals.  A
kernel gridded over batch with (C, HW) blocks would keep scores/softmax/
apply in VMEM — but needs q/k/v transposed to (B, C, HW) first.  Measures:

  T1  XLA transpose (H,W,C,B) -> (B,C,HW) at L1
  K1  kernel: norms + scores + temperature + softmax + apply per batch
  A0  current XLA einsum pair + norms (baseline)

Verdict = T1*4 + K1 vs A0.
"""

from __future__ import annotations

import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H, W, C, B = 200, 300, 36, 128
HW = H * W


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, temp):
    f32 = jnp.float32
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    # raw scores: contract HW (lanes on both sides)
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=f32)  # (C, C)
    nq = jax.lax.rsqrt(jnp.maximum(jnp.sum(jnp.square(q.astype(f32)), axis=1, keepdims=True), 1e-24))
    nk = jax.lax.rsqrt(jnp.maximum(jnp.sum(jnp.square(k.astype(f32)), axis=1, keepdims=True), 1e-24))
    s = s * nq * nk.T * temp
    a = jax.nn.softmax(s, axis=-1)
    out = jax.lax.dot_general(a.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                              preferred_element_type=f32)
    o_ref[0] = out.astype(o_ref.dtype)


def attn_pallas(q, k, v, temp=1.0):
    b, c, hw = q.shape
    kern = functools.partial(_attn_kernel, temp=temp)
    spec = pl.BlockSpec((1, c, hw), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid=(b,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((b, c, hw), q.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(q, k, v)


def timed(fn, *args, iters=8, label=""):
    @jax.jit
    def loop(*a):
        def body(carry, _):
            y = fn(jax.lax.dynamic_update_slice(
                a[0], (carry * 1e-9).astype(a[0].dtype).reshape((1,) * a[0].ndim), (0,) * a[0].ndim
            ), *a[1:])
            return jnp.sum(y[(0,) * (y.ndim - 1)]).astype(jnp.float32) * 1e-12, None

        final, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None, length=iters)
        return final

    _ = float(loop(*args))
    t0 = time.perf_counter()
    _ = float(loop(*args))
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{label:55s} {dt:8.3f} ms")
    return dt


def main():
    rng = np.random.default_rng(0)
    qh = jnp.asarray(rng.standard_normal((H, W, C, B)), jnp.bfloat16)
    qb = jnp.asarray(rng.standard_normal((B, C, HW)), jnp.bfloat16)

    # correctness vs jnp at small scale
    qs = jnp.asarray(rng.standard_normal((4, 8, 96)) * 0.5, jnp.float32)
    ks = jnp.asarray(rng.standard_normal((4, 8, 96)) * 0.5, jnp.float32)
    vs = jnp.asarray(rng.standard_normal((4, 8, 96)) * 0.5, jnp.float32)

    def ref_attn(q, k, v):
        f32 = jnp.float32
        s = jnp.einsum("bcn,bdn->bcd", q, k, preferred_element_type=f32)
        nq = jax.lax.rsqrt(jnp.maximum(jnp.sum(q.astype(f32) ** 2, axis=2), 1e-24))
        nk = jax.lax.rsqrt(jnp.maximum(jnp.sum(k.astype(f32) ** 2, axis=2), 1e-24))
        s = s * nq[:, :, None] * nk[:, None, :]
        a = jax.nn.softmax(s, axis=-1)
        return jnp.einsum("bcd,bdn->bcn", a.astype(v.dtype), v)

    got = attn_pallas(qs, ks, vs)
    want = ref_attn(qs, ks, vs)
    print("probe parity (f32, small):", float(jnp.max(jnp.abs(got - want))))

    timed(lambda x: jnp.transpose(x, (3, 2, 0, 1)).reshape(B, C, HW), qh,
          label="T1 transpose HWCB -> (B,C,HW)")
    timed(attn_pallas, qb, qb, qb, label="K1 per-batch attention kernel")

    def xla_attn_hwcb(q, k, v):
        f32 = jnp.float32
        s = jnp.einsum("hwcb,hwdb->bcd", q, k, preferred_element_type=f32)
        nq = jax.lax.rsqrt(jnp.maximum(jnp.sum(q.astype(f32) ** 2, axis=(0, 1)), 1e-24))
        nk = jax.lax.rsqrt(jnp.maximum(jnp.sum(k.astype(f32) ** 2, axis=(0, 1)), 1e-24))
        s = s * nq.T[:, :, None] * nk.T[:, None, :]
        a = jax.nn.softmax(s, axis=-1)
        return jnp.einsum("bcd,hwdb->hwcb", a.astype(v.dtype), v)

    timed(xla_attn_hwcb, qh, qh, qh, label="A0 XLA einsum attention (current)")


if __name__ == "__main__":
    main()
