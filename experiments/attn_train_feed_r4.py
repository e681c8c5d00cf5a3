"""Round-4: train-side attention-feed layout A/B (VERDICT r3 item 7).

The train profile (experiments/train_bench_r3.py) attributes ~30 ms/step to
layout copies around the attention einsums, both passes.  Train batches
(b=16) are NOT lane-aligned: in the HWCB layout batch sits in lanes and pads
16 -> 128, so the einsum's internal {1,2,0,3} operand relayouts (cheap and
paid-for at serving b=128, docs/PERF_CEILING.md §3.4) may be the wrong arm
at train geometry.

Arms, each timed fwd-only and fwd+bwd at the three LCA feed geometries
(crop 256: L1 128x128xC36 .. L3 32x32xC144, b=16; grad-enabled like training):

  A  current: einsum('hwcb,hwdb->bcd') + einsum('bcd,hwdb->hwcb') from HWCB
  B  explicit batch-major: transpose to (B,C,N) once, score via
     dot_general (C,N)x(D,N), value matmul in (B,C,N), transpose back
  C  flattened-spatial: reshape HWCB->(N,C,B) (free: H,W major-adjacent),
     einsum('ncb,ndb->bcd') — same contraction, different operand shape
     presented to XLA's layout assignment

All arms share the hoisted-norm scores + folded projection (exact same math
as ops/attention.py channel_attention_xla).  If B or C wins >=10% at the
summed sites, the dispatcher grows a train-geometry branch; else the ledger
records the negative (VERDICT done-criterion: train step <= 190 ms or a
ledger entry).

Usage: python experiments/attn_train_feed_r4.py   (TPU window required)
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

f32 = jnp.float32


def _scores_mask_softmax(s, q, k, temp_per_c, heads):
    c = s.shape[1]
    cp = c // heads

    def _inv_norm_bcn(t):  # t: (B, C, N) -> (B, C)
        sq = jnp.sum(jnp.square(t.astype(f32)), axis=-1)
        return jax.lax.rsqrt(jnp.maximum(sq, 1e-24))

    s = s * _inv_norm_bcn(q)[:, :, None] * _inv_norm_bcn(k)[:, None, :]
    s = s * temp_per_c[None, :, None]
    if heads > 1:
        head_id = np.arange(c) // cp
        block = jnp.asarray(head_id[:, None] == head_id[None, :])
        s = jnp.where(block[None], s, -jnp.inf)
    return jax.nn.softmax(s, axis=-1)


def arm_a_hwcb(q, k, v, temp_per_c, wp, heads):
    """Current production arm (ops/attention.py channel_attention_xla)."""
    s = jnp.einsum("hwcb,hwdb->bcd", q, k, preferred_element_type=f32)
    qb = jnp.transpose(q, (3, 2, 0, 1)).reshape(q.shape[3], q.shape[2], -1)
    kb = jnp.transpose(k, (3, 2, 0, 1)).reshape(k.shape[3], k.shape[2], -1)
    a = _scores_mask_softmax(s, qb, kb, temp_per_c, heads)
    a = jnp.einsum("co,bcd->bod", wp, a)
    return jnp.einsum("bcd,hwdb->hwcb", a.astype(v.dtype), v)


def arm_a_exact(q, k, v, temp_per_c, wp, heads):
    """Arm A with the production norm hoist (no bcn transpose for norms)."""
    s = jnp.einsum("hwcb,hwdb->bcd", q, k, preferred_element_type=f32)

    def _inv_norm(t):  # (1/max(|t_cb|,eps)) as (B, C)
        sq = jnp.sum(jnp.square(t.astype(f32)), axis=(0, 1))
        return jax.lax.rsqrt(jnp.maximum(sq, 1e-24)).T

    c = q.shape[2]
    cp = c // heads
    s = s * _inv_norm(q)[:, :, None] * _inv_norm(k)[:, None, :]
    s = s * temp_per_c[None, :, None]
    if heads > 1:
        head_id = np.arange(c) // cp
        block = jnp.asarray(head_id[:, None] == head_id[None, :])
        s = jnp.where(block[None], s, -jnp.inf)
    a = jax.nn.softmax(s, axis=-1)
    a = jnp.einsum("co,bcd->bod", wp, a)
    return jnp.einsum("bcd,hwdb->hwcb", a.astype(v.dtype), v)


def arm_b_bcn(q, k, v, temp_per_c, wp, heads):
    """Explicit batch-major staging: pay ONE user transpose per operand."""
    h, w, c, b = q.shape
    to = lambda t: jnp.transpose(t, (3, 2, 0, 1)).reshape(b, c, h * w)
    qb, kb, vb = to(q), to(k), to(v)
    s = jnp.einsum("bcn,bdn->bcd", qb, kb, preferred_element_type=f32)
    a = _scores_mask_softmax(s, qb, kb, temp_per_c, heads)
    a = jnp.einsum("co,bcd->bod", wp, a)
    ob = jnp.einsum("bcd,bdn->bcn", a.astype(vb.dtype), vb)
    return jnp.transpose(ob.reshape(b, c, h, w), (2, 3, 1, 0))


def arm_c_ncb(q, k, v, temp_per_c, wp, heads):
    """Flattened-spatial presentation: HWCB -> (N, C, B) is layout-free.

    The q/k norms reduce the (N, C, B) operands over axis 0 directly — NO
    batch-major transposes anywhere in this arm (an earlier draft fed the
    shared norm helper via (B,C,N) copies, which are exactly the relayouts
    under measurement and would have biased the A/B against this arm).
    """
    h, w, c, b = q.shape
    cp = c // heads
    fl = lambda t: t.reshape(h * w, c, b)
    qf, kf, vf = fl(q), fl(k), fl(v)
    s = jnp.einsum("ncb,ndb->bcd", qf, kf, preferred_element_type=f32)

    def _inv_norm(t):  # (N, C, B) -> (B, C), transpose-free reduction
        sq = jnp.sum(jnp.square(t.astype(f32)), axis=0)
        return jax.lax.rsqrt(jnp.maximum(sq, 1e-24)).T

    s = s * _inv_norm(qf)[:, :, None] * _inv_norm(kf)[:, None, :]
    s = s * temp_per_c[None, :, None]
    if heads > 1:
        head_id = np.arange(c) // cp
        block = jnp.asarray(head_id[:, None] == head_id[None, :])
        s = jnp.where(block[None], s, -jnp.inf)
    a = jax.nn.softmax(s, axis=-1)
    a = jnp.einsum("co,bcd->bod", wp, a)
    return jnp.einsum("bcd,ndb->ncb", a.astype(vf.dtype), vf).reshape(h, w, c, b)


ARMS = {"A(prod)": arm_a_exact, "B(bcn)": arm_b_bcn, "C(ncb)": arm_c_ncb}

# train geometry, crop 256: LCA sites at L1/L2/L3
SITES = [(128, 128, 36, 6), (64, 64, 72, 6), (32, 32, 144, 6)]
BATCH = 16
ITERS = 16


def timed(fn, *args, iters=ITERS):
    @jax.jit
    def loop(*a):
        def body(carry, _):
            y = fn(a[0] + carry.astype(a[0].dtype), *a[1:])
            return (jnp.mean(y) * 1e-20).astype(f32), None

        final, _ = jax.lax.scan(body, jnp.zeros((), f32), None, length=iters)
        return final

    _ = float(loop(*args))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        _ = float(loop(*args))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e3


def timed_grad(fn, *args, iters=ITERS):
    def loss(q, k, v, t, w):
        return jnp.sum(fn(q, k, v, t, w).astype(f32))

    g = jax.grad(loss, argnums=(0, 1, 2))

    @jax.jit
    def loop(*a):
        def body(carry, _):
            gq, gk, gv = g(a[0] + carry.astype(a[0].dtype), *a[1:])
            return (jnp.mean(gq) * 1e-20).astype(f32), None

        final, _ = jax.lax.scan(body, jnp.zeros((), f32), None, length=iters)
        return final

    _ = float(loop(*args))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        _ = float(loop(*args))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e3


def main() -> None:
    rng = np.random.default_rng(0)
    totals_f = {k: 0.0 for k in ARMS}
    totals_g = {k: 0.0 for k in ARMS}
    for h, w, c, heads in SITES:
        q = jnp.asarray(rng.normal(size=(h, w, c, BATCH)), jnp.bfloat16)
        k = jnp.asarray(rng.normal(size=(h, w, c, BATCH)), jnp.bfloat16)
        v = jnp.asarray(rng.normal(size=(h, w, c, BATCH)), jnp.bfloat16)
        temp = jnp.asarray(rng.normal(size=(c,)), f32)
        wp = jnp.asarray(rng.normal(size=(c, c)), f32)
        # parity gate first: arms must agree (bf16 tolerance)
        ref = None
        for name, fn in ARMS.items():
            out = np.asarray(fn(q, k, v, temp, wp, heads), np.float32)
            if ref is None:
                ref = out
            else:
                d = np.max(np.abs(out - ref))
                assert d < 0.15, f"{name} deviates {d} at {h}x{w}x{c}"
        print(f"-- site {h}x{w} c={c} heads={heads} b={BATCH}")
        for name, fn in ARMS.items():
            # close over heads: as a positional jit arg it would be traced,
            # and the `if heads > 1` mask branch needs a Python int
            fn2 = (lambda f, hd: lambda q, k, v, t, w: f(q, k, v, t, w, hd))(fn, heads)
            tf = timed(fn2, q, k, v, temp, wp)
            tg = timed_grad(fn2, q, k, v, temp, wp)
            totals_f[name] += tf
            totals_g[name] += tg
            print(f"   {name:8s} fwd {tf:7.3f} ms   fwd+bwd {tg:7.3f} ms", flush=True)
    print("-- summed over sites (x4 LCA blocks each in the real model)")
    for name in ARMS:
        print(f"   {name:8s} fwd {totals_f[name]:7.3f} ms   fwd+bwd {totals_g[name]:7.3f} ms")


if __name__ == "__main__":
    main()
