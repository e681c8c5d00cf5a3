"""HWCB follow-up: resize + attention formulations.

The post-HWCB HLO audit still shows ~31.8 GB/fwd of copies: ~16 GB from the
banded resize interleave (5-D stack+reshape copies at L0/L1) and ~11 GB of
W-minor copies XLA inserts to feed the attention score dot_generals.
Measures alternatives at bench shapes.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from hvi_cidnet_tpu.ops.resize import (
    _axis_matmul_major,
    _double_major,
    _half_major,
    _interp_matrix,
)

dt16 = jnp.bfloat16


def timed(fn, *args, iters=8, label=""):
    @jax.jit
    def loop(*a):
        def body(carry, _):
            y = fn(jax.lax.dynamic_update_slice(
                a[0], (carry * 1e-9).astype(a[0].dtype).reshape((1,) * a[0].ndim), (0,) * a[0].ndim
            ), *a[1:])
            first = y[0] if isinstance(y, tuple) else y
            return jnp.sum(first[(0,) * (first.ndim - 1)]).astype(jnp.float32) * 1e-12, None

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
    B = 128

    q = jnp.asarray(rng.standard_normal((200, 300, 36, B)), dt16)
    timed(lambda q, k: jnp.einsum("hwcb,hwdb->bcd", q, k, preferred_element_type=jnp.float32),
          q, q, label="A1a scores einsum hwcb")
    timed(lambda q, k: jnp.einsum("ncb,ndb->bcd", q.reshape(-1, 36, B), k.reshape(-1, 36, B),
                                  preferred_element_type=jnp.float32),
          q, q, label="A1b scores reshaped (HW,C,B)")
    attn = jnp.asarray(rng.standard_normal((B, 36, 36)) * 0.1, dt16)
    timed(lambda v, a: jnp.einsum("bcd,hwdb->hwcb", a, v), q, attn, label="A2a apply einsum hwcb")
    timed(lambda v, a: jnp.einsum("bcd,ndb->ncb", a, v.reshape(-1, 36, B)), q, attn,
          label="A2b apply reshaped")

    w1 = jnp.asarray(rng.standard_normal((1, 1, 36, 36)) * 0.1, dt16)
    wdw = jnp.asarray(rng.standard_normal((3, 3, 1, 36)) * 0.1, dt16)
    DN = ("HWCN", "HWIO", "HWCN")

    def cab_core(x, w1, wdw):
        cv1 = lambda t: jax.lax.conv_general_dilated(t, w1, (1, 1), "VALID", dimension_numbers=DN)
        dw = lambda t: jax.lax.conv_general_dilated(t, wdw, (1, 1), "SAME", dimension_numbers=DN,
                                                    feature_group_count=36)
        qq, kk, vv = dw(cv1(x)), dw(cv1(x)), dw(cv1(x))
        s = jnp.einsum("hwcb,hwdb->bcd", qq, kk, preferred_element_type=jnp.float32)
        a = jax.nn.softmax(s, axis=-1)
        out = jnp.einsum("bcd,hwdb->hwcb", a.astype(vv.dtype), vv)
        return cv1(out)

    timed(cab_core, q, w1, wdw, label="A3 full CAB core (qkv+attn+proj)")


if __name__ == "__main__":
    main()
