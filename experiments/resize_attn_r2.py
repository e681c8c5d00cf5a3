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

    # ---- x0.5 at L0 (the HVE/IE_block1 site): (400,600,36,B) -> (200,300,...)
    x0 = jnp.asarray(rng.standard_normal((400, 600, 36, B)), dt16)
    timed(lambda x: _half_major(_half_major(x, 0), 1), x0, label="R1a half L0 banded H+W")
    timed(lambda x: _axis_matmul_major(_axis_matmul_major(x, 0, 200, True), 1, 300, True),
          x0, label="R1b half L0 matmul H+W")
    timed(lambda x: _axis_matmul_major(_half_major(x, 0), 1, 300, True),
          x0, label="R1c half L0 banded H + matmul W")

    # ---- x2 at L1->L0 (HVD/ID_block1): (200,300,36,B) -> (400,600,...)
    x1 = jnp.asarray(rng.standard_normal((200, 300, 36, B)), dt16)
    timed(lambda x: _double_major(_double_major(x, 0), 1), x1, label="R2a double L1 banded H+W")
    timed(lambda x: _axis_matmul_major(_axis_matmul_major(x, 0, 400, True), 1, 600, True),
          x1, label="R2b double L1 matmul H+W")
    timed(lambda x: _axis_matmul_major(_double_major(x, 0), 1, 600, True),
          x1, label="R2c double L1 banded H + matmul W")

    # conv3x3 + x0.5 together (the NormDownsample pattern): does the copy fuse?
    w33 = jnp.asarray(rng.standard_normal((3, 3, 36, 36)) * 0.1, dt16)
    DN = ("HWCN", "HWIO", "HWCN")
    cv = lambda x, w: jax.lax.conv_general_dilated(x, w, (1, 1), "SAME", dimension_numbers=DN)
    timed(lambda x, w: _half_major(_half_major(cv(x, w), 0), 1), x0, w33,
          label="R3a conv3x3+half banded")
    timed(lambda x, w: _axis_matmul_major(_half_major(cv(x, w), 0), 1, 300, True), x0, w33,
          label="R3b conv3x3+half banded-H matmul-W")
    # strided conv: fold the x0.5's even-tap structure? (not exact; ceiling probe:
    # conv with stride 2 gives the even-sample cost floor)
    timed(lambda x, w: jax.lax.conv_general_dilated(x, w, (2, 2), "SAME", dimension_numbers=DN),
          x0, w33, label="R3c conv3x3 stride2 (cost floor probe)")

    # ---- attention scores at L1: q,k (200,300,36,B)
    q = jnp.asarray(rng.standard_normal((200, 300, 36, B)), dt16)
    timed(lambda q, k: jnp.einsum("hwcb,hwdb->bcd", q, k, preferred_element_type=jnp.float32),
          q, q, label="A1a scores einsum hwcb")
    timed(lambda q, k: jnp.einsum("ncb,ndb->bcd", q.reshape(-1, 36, B), k.reshape(-1, 36, B),
                                  preferred_element_type=jnp.float32),
          q, q, label="A1b scores reshaped (HW,C,B)")
    attn = jnp.asarray(rng.standard_normal((B, 36, 36)) * 0.1, dt16)
    timed(lambda v, a: jnp.einsum("bcd,hwdb->hwcb", a, v), q, attn, label="A2a apply einsum hwcb")

    # fused qkv-style: 3 convs feeding scores+apply (copy behavior in context)
    w1 = jnp.asarray(rng.standard_normal((1, 1, 36, 36)) * 0.1, dt16)
    wdw = jnp.asarray(rng.standard_normal((3, 3, 1, 36)) * 0.1, dt16)

    def cab_core(x, w1, wdw, attnless=False):
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
