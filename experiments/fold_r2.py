"""Trace-time folding of dw3x3(conv1x1(x)) into one dense 3x3 conv (HWCB).

w_dense[dy, dx, c, o] = w1[c, o] * wdw[dy, dx, o] — exact in exact
arithmetic; measures cost + fp32/bf16 deviation at the bench L1 shape.
Covers the IEL expand (36->2*95) and CAB q/kv (36->36 / 36->72) sites.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

dt16 = jnp.bfloat16
DN = ("HWCN", "HWIO", "HWCN")
B, H, W, C = 128, 100, 300, 36
CH = 95


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


def cv1(x, w):
    return jax.lax.conv_general_dilated(x, w, (1, 1), "VALID", dimension_numbers=DN)


def cv3(x, w):
    return jax.lax.conv_general_dilated(x, w, (1, 1), "SAME", dimension_numbers=DN)


def dw(x, w):
    return jax.lax.conv_general_dilated(x, w, (1, 1), "SAME", dimension_numbers=DN,
                                        feature_group_count=x.shape[2])


def fold(w1, wdw):
    """(1,1,C,O) + (3,3,1,O) -> (3,3,C,O)."""
    return w1[0, 0][None, None, :, :] * wdw[:, :, 0, :][:, :, None, :]


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((H, W, C, B)), dt16)

    for o, tag in [(C, "q 36->36"), (2 * C, "kv 36->72"), (2 * CH, "iel expand 36->190")]:
        w1 = jnp.asarray(rng.standard_normal((1, 1, C, o)) * 0.1, dt16)
        wd = jnp.asarray(rng.standard_normal((3, 3, 1, o)) * 0.1, dt16)
        timed(lambda x, w1, wd: dw(cv1(x, w1), wd), x, w1, wd, label=f"U {tag} (1x1 then dw)")
        timed(lambda x, w1, wd: cv3(x, fold(w1, wd)), x, w1, wd, label=f"F {tag} (folded dense 3x3)")
        if o == C:
            f32 = lambda t: t.astype(jnp.float32)
            a = dw(cv1(f32(x), f32(w1)), f32(wd))
            b = cv3(f32(x), fold(f32(w1), f32(wd)))
            print("   fp32 |diff|max:", float(jnp.max(jnp.abs(a - b))),
                  " rel:", float(jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(a)) + 1e-9)))

    # full IEL: current vs dw1-folded (gate dw stays)
    w_pi = jnp.asarray(rng.standard_normal((1, 1, C, 2 * CH)) * 0.1, dt16)
    w_dw = jnp.asarray(rng.standard_normal((3, 3, 1, 2 * CH)) * 0.1, dt16)
    w_dw1 = jnp.asarray(rng.standard_normal((3, 3, 1, CH)) * 0.1, dt16)
    w_dw2 = jnp.asarray(rng.standard_normal((3, 3, 1, CH)) * 0.1, dt16)
    w_po = jnp.asarray(rng.standard_normal((1, 1, CH, C)) * 0.1, dt16)

    def iel_cur(x, w_pi, w_dw, w_dw1, w_dw2, w_po):
        x1 = dw(cv1(x, w_pi[..., :CH]), w_dw[..., :CH])
        x2 = dw(cv1(x, w_pi[..., CH:]), w_dw[..., CH:])
        x1 = jnp.tanh(dw(x1, w_dw1)) + x1
        x2 = jnp.tanh(dw(x2, w_dw2)) + x2
        return cv1(x1 * x2, w_po)

    def iel_fold(x, w_pi, w_dw, w_dw1, w_dw2, w_po):
        wd = fold(w_pi, w_dw)  # (3,3,36,190)
        x12 = cv3(x, wd)
        x1, x2 = x12[:, :, :CH], x12[:, :, CH:]
        x1 = jnp.tanh(dw(x1, w_dw1)) + x1
        x2 = jnp.tanh(dw(x2, w_dw2)) + x2
        return cv1(x1 * x2, w_po)

    def iel_fold_split(x, w_pi, w_dw, w_dw1, w_dw2, w_po):
        x1 = cv3(x, fold(w_pi[..., :CH], w_dw[..., :CH]))
        x2 = cv3(x, fold(w_pi[..., CH:], w_dw[..., CH:]))
        x1 = jnp.tanh(dw(x1, w_dw1)) + x1
        x2 = jnp.tanh(dw(x2, w_dw2)) + x2
        return cv1(x1 * x2, w_po)

    timed(iel_cur, x, w_pi, w_dw, w_dw1, w_dw2, w_po, label="IEL current")
    timed(iel_fold, x, w_pi, w_dw, w_dw1, w_dw2, w_po, label="IEL dw1 folded (joint)")
    timed(iel_fold_split, x, w_pi, w_dw, w_dw1, w_dw2, w_po, label="IEL dw1 folded (split halves)")

    # CAB core with folded qkv
    wq1 = jnp.asarray(rng.standard_normal((1, 1, C, C)) * 0.1, dt16)
    wqd = jnp.asarray(rng.standard_normal((3, 3, 1, C)) * 0.1, dt16)
    wkv1 = jnp.asarray(rng.standard_normal((1, 1, C, 2 * C)) * 0.1, dt16)
    wkvd = jnp.asarray(rng.standard_normal((3, 3, 1, 2 * C)) * 0.1, dt16)
    wpo = jnp.asarray(rng.standard_normal((1, 1, C, C)) * 0.1, dt16)

    def cab_cur(x, wq1, wqd, wkv1, wkvd, wpo):
        q = dw(cv1(x, wq1), wqd)
        k = dw(cv1(x, wkv1[..., :C]), wkvd[..., :C])
        v = dw(cv1(x, wkv1[..., C:]), wkvd[..., C:])
        s = jnp.einsum("hwcb,hwdb->bcd", q, k, preferred_element_type=jnp.float32)
        a = jax.nn.softmax(s, axis=-1)
        return cv1(jnp.einsum("bcd,hwdb->hwcb", a.astype(v.dtype), v), wpo)

    def cab_fold(x, wq1, wqd, wkv1, wkvd, wpo):
        q = cv3(x, fold(wq1, wqd))
        k = cv3(x, fold(wkv1[..., :C], wkvd[..., :C]))
        v = cv3(x, fold(wkv1[..., C:], wkvd[..., C:]))
        s = jnp.einsum("hwcb,hwdb->bcd", q, k, preferred_element_type=jnp.float32)
        a = jax.nn.softmax(s, axis=-1)
        return cv1(jnp.einsum("bcd,hwdb->hwcb", a.astype(v.dtype), v), wpo)

    timed(cab_cur, x, wq1, wqd, wkv1, wkvd, wpo, label="CAB current")
    timed(cab_fold, x, wq1, wqd, wkv1, wkvd, wpo, label="CAB qkv folded")


if __name__ == "__main__":
    main()
