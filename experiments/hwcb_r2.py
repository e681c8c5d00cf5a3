"""Layout experiment: logical (H, W, C, B) — row-major == XLA-TPU's preferred
conv layout ({0,2,3,1} on NHCW operands, i.e. lanes=batch, sublanes=C).

If convs and their elementwise neighbors all live in this layout natively,
the 41.5 GB/fwd of layout-conversion copies (hlo_copies_r2) should vanish.
Compares each hot primitive in NHCW (current) vs HWCB at the bench L1 shape.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

DN_NHCW = ("NHCW", "HWIO", "NHCW")
DN_HWCB = ("HWCN", "HWIO", "HWCN")
B, H, W, C = 128, 100, 300, 36
CH = 95
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
    x_n = jnp.asarray(rng.standard_normal((B, H, C, W)), dt16)
    x_h = jnp.asarray(np.transpose(np.asarray(x_n, np.float32), (1, 3, 2, 0)), dt16)  # (H,W,C,B)
    xh_n = jnp.asarray(rng.standard_normal((B, H, CH, W)), dt16)
    xh_h = jnp.asarray(np.transpose(np.asarray(xh_n, np.float32), (1, 3, 2, 0)), dt16)
    w1 = jnp.asarray(rng.standard_normal((1, 1, C, CH)) * 0.1, dt16)
    wdw = jnp.asarray(rng.standard_normal((3, 3, 1, CH)) * 0.1, dt16)
    w33 = jnp.asarray(rng.standard_normal((3, 3, C, C)) * 0.1, dt16)
    g = jnp.asarray(rng.standard_normal((C,)) * 0.1 + 1, jnp.float32)
    bta = jnp.asarray(rng.standard_normal((C,)) * 0.1, jnp.float32)

    def conv(dn):
        return lambda x, w, **kw: jax.lax.conv_general_dilated(
            x, w, (1, 1), kw.pop("padding", "SAME"), dimension_numbers=dn, **kw)

    cn, chw = conv(DN_NHCW), conv(DN_HWCB)

    # 1x1
    timed(lambda x, w: cn(x, w, padding="VALID"), x_n, w1, label="G1a conv1x1 NHCW")
    timed(lambda x, w: chw(x, w, padding="VALID"), x_h, w1, label="G1b conv1x1 HWCB")
    # dw
    timed(lambda x, w: cn(x, w, feature_group_count=CH), xh_n, wdw, label="G2a dw3x3 NHCW")
    timed(lambda x, w: chw(x, w, feature_group_count=CH), xh_h, wdw, label="G2b dw3x3 HWCB")
    # dense 3x3
    timed(lambda x, w: cn(x, w), x_n, w33, label="G3a conv3x3 36->36 NHCW")
    timed(lambda x, w: chw(x, w), x_h, w33, label="G3b conv3x3 36->36 HWCB")

    # LN (channel axis: NHCW ax2 / HWCB ax2)
    def ln(x, g, b):
        n = x.shape[2]
        gg = g.reshape(1, 1, -1, 1)
        bb = b.reshape(1, 1, -1, 1)
        u = jnp.sum(x, axis=2, keepdims=True, dtype=jnp.float32) / n
        m2 = jnp.sum(jnp.square(x.astype(jnp.float32)), axis=2, keepdims=True) / n
        s = jnp.maximum(m2 - u * u, 0.0)
        return (gg * ((x.astype(jnp.float32) - u) * jax.lax.rsqrt(s + 1e-6)) + bb).astype(x.dtype)

    def ln_hwcb(x, g, b):
        gg = g.reshape(1, 1, -1, 1)
        bb = b.reshape(1, 1, -1, 1)
        u = jnp.sum(x, axis=2, keepdims=True, dtype=jnp.float32) / x.shape[2]
        m2 = jnp.sum(jnp.square(x.astype(jnp.float32)), axis=2, keepdims=True) / x.shape[2]
        s = jnp.maximum(m2 - u * u, 0.0)
        return (gg * ((x.astype(jnp.float32) - u) * jax.lax.rsqrt(s + 1e-6)) + bb).astype(x.dtype)

    timed(ln, x_n, g, bta, label="G4a LN NHCW")
    timed(ln_hwcb, x_h, g, bta, label="G4b LN HWCB")

    # attention einsums (scores + apply), fp32 softmax omitted
    q_n = x_n
    timed(lambda q, k: jnp.einsum("bhcw,bhdw->bcd", q, k, preferred_element_type=jnp.float32),
          q_n, x_n, label="G5a attn scores NHCW")
    timed(lambda q, k: jnp.einsum("hwcb,hwdb->bcd", q, k, preferred_element_type=jnp.float32),
          x_h, x_h, label="G5b attn scores HWCB")
    attn_b = jnp.asarray(rng.standard_normal((B, C, C)) * 0.1, dt16)
    timed(lambda v, a: jnp.einsum("bcd,bhdw->bhcw", a, v), x_n, attn_b, label="G6a attn apply NHCW")
    timed(lambda v, a: jnp.einsum("bcd,hwdb->hwcb", a, v), x_h, attn_b, label="G6b attn apply HWCB")

    # full IEL chain
    w_pi = jnp.asarray(rng.standard_normal((1, 1, C, 2 * CH)) * 0.1, dt16)
    w_dw = jnp.asarray(rng.standard_normal((3, 3, 1, 2 * CH)) * 0.1, dt16)
    w_dw1 = jnp.asarray(rng.standard_normal((3, 3, 1, CH)) * 0.1, dt16)
    w_dw2 = jnp.asarray(rng.standard_normal((3, 3, 1, CH)) * 0.1, dt16)
    w_po = jnp.asarray(rng.standard_normal((1, 1, CH, C)) * 0.1, dt16)

    def iel(cv, ch_axis):
        def f(x, w_pi, w_dw, w_dw1, w_dw2, w_po):
            x1 = cv(cv(x, w_pi[..., :CH], padding="VALID"), w_dw[..., :CH], feature_group_count=CH)
            x2 = cv(cv(x, w_pi[..., CH:], padding="VALID"), w_dw[..., CH:], feature_group_count=CH)
            x1 = jnp.tanh(cv(x1, w_dw1, feature_group_count=CH)) + x1
            x2 = jnp.tanh(cv(x2, w_dw2, feature_group_count=CH)) + x2
            return cv(x1 * x2, w_po, padding="VALID")
        return f

    timed(iel(cn, 2), x_n, w_pi, w_dw, w_dw1, w_dw2, w_po, label="G7a IEL NHCW")
    timed(iel(chw, 2), x_h, w_pi, w_dw, w_dw1, w_dw2, w_po, label="G7b IEL HWCB")

    # LN + IEL (does LN fuse with the conv in HWCB-land?)
    timed(lambda x, *w: iel(cn, 2)(ln(x, g, bta), *w), x_n, w_pi, w_dw, w_dw1, w_dw2, w_po,
          label="G8a LN+IEL NHCW")
    timed(lambda x, *w: iel(chw, 2)(ln_hwcb(x, g, bta), *w), x_h, w_pi, w_dw, w_dw1, w_dw2, w_po,
          label="G8b LN+IEL HWCB")

    # parity
    f32 = lambda t: t.astype(jnp.float32)
    r_n = iel(cn, 2)(f32(x_n), f32(w_pi), f32(w_dw), f32(w_dw1), f32(w_dw2), f32(w_po))
    r_h = iel(chw, 2)(f32(x_h), f32(w_pi), f32(w_dw), f32(w_dw1), f32(w_dw2), f32(w_po))
    diff = jnp.max(jnp.abs(r_n - jnp.transpose(r_h, (3, 0, 2, 1))))
    print("G7 parity fp32 |diff|max:", float(diff))


if __name__ == "__main__":
    main()
