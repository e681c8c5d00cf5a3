"""Round-2 "flat-land" layout experiments.

Hypothesis (from the r2 HLO dump): XLA-TPU lays conv fusions out with
batch minor (B=128 == one lane tile) and spends ~41 GB/fwd copy-converting
around our NHCW graph.  If activations flow as 2-D ``(C, H*W*B)`` with B
innermost:

  * 1x1 convs are plain (O, C) x (C, N) matmuls (MXU weight-stationary),
  * LayerNorm is a sublane reduce,
  * depthwise-3x3 taps are shifts by +-B / +-W*B lanes — tile-aligned when
    B % 128 == 0, so XLA can realize them as cheap aligned slices and fuse
    the 9-tap fma chain with its elementwise neighbors,
  * everything between convs fuses freely (no NHCW <-> conv-layout copies).

Measures, at the bench's L1 hot shape (B=128, H=200, W=300, C=36, hid=95):

  F1 layout round-trip cost  F2 flat 1x1 vs conv  F3 flat dw vs conv dw
  F4 flat full-IEL vs the current NHCW IEL        F5 flat LN
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

DN = ("NHCW", "HWIO", "NHCW")
B, H, W, C = 128, 100, 300, 36  # H halved vs bench L1 for HBM headroom
CH = 95
dt16 = jnp.bfloat16
# padded flat geometry: rows carry 2 zero pad cols; one zero row top+bottom
WP = W + 2
HP = H + 2
N = HP * WP * B


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


def to_flat(x_nhcw):
    """(B,H,C,W) -> (C, HP*WP*B) with zero pad cols/rows."""
    t = jnp.transpose(x_nhcw, (2, 1, 3, 0))  # (C,H,W,B)
    t = jnp.pad(t, ((0, 0), (1, 1), (0, 2), (0, 0)))
    return t.reshape(C, N)


def from_flat(f, c=C):
    t = f.reshape(c, HP, WP, B)[:, 1:-1, :W]
    return jnp.transpose(t, (3, 1, 0, 2))  # (B,H,c,W)


def shift(f, dy, dx):
    """tap (dy,dx) via tile-aligned lane shift (B and WP*B both %128==0)."""
    off = (dy * WP + dx) * B
    n = f.shape[-1]
    if off == 0:
        return f
    if off > 0:
        return jnp.pad(f, ((0, 0), (0, off)))[:, off:]
    return jnp.pad(f, ((0, 0), (-off, 0)))[:, :n]


def dw_flat(f, taps):
    """taps: (9, C2, 1) jnp array; zero-'SAME' == pad cols stay zero."""
    out = None
    i = 0
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            term = taps[i] * shift(f, dy, dx)
            out = term if out is None else out + term
            i += 1
    return out


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, H, C, W)), dt16)
    xf = jax.jit(to_flat)(x)
    xh = jnp.asarray(rng.standard_normal((CH, N)), dt16)
    w1 = jnp.asarray(rng.standard_normal((1, 1, C, CH)) * 0.1, dt16)
    w1f = jnp.asarray(w1[0, 0].T, dt16)  # (CH, C)
    wdw = jnp.asarray(rng.standard_normal((3, 3, 1, CH)) * 0.1, dt16)
    tdw = jnp.asarray(wdw[:, :, 0, :].reshape(9, CH, 1), dt16)
    g = jnp.asarray(rng.standard_normal((C, 1)) * 0.1 + 1, jnp.float32)
    bta = jnp.asarray(rng.standard_normal((C, 1)) * 0.1, jnp.float32)

    print(f"flat shapes: x=({C},{N}) bf16 ({C*N*2/1e9:.2f} GB), hidden={CH}")

    # --- F1: layout round trip ---
    timed(lambda x: from_flat(to_flat(x)), x, label="F1 to_flat + from_flat round trip")

    # --- F2: 1x1 ---
    timed(lambda x, w: jax.lax.conv_general_dilated(x, w, (1, 1), "VALID", dimension_numbers=DN),
          x, w1, label="F2a conv1x1 36->95 (NHCW conv, current)")
    timed(lambda f, w: jax.lax.dot_general(w, f, (((1,), (0,)), ((), ()))),
          xf, w1f, label="F2b flat 1x1 as (95,36)x(36,N) matmul")

    # --- F3: depthwise ---
    xh4 = jnp.asarray(rng.standard_normal((B, H, CH, W)), dt16)
    timed(lambda x, w: jax.lax.conv_general_dilated(x, w, (1, 1), "SAME", dimension_numbers=DN,
                                                    feature_group_count=CH),
          xh4, wdw, label="F3a dw3x3 95ch (NHCW conv, current)")
    timed(dw_flat, xh, tdw, label="F3b flat dw3x3 95ch (9 aligned shifts)")
    timed(lambda f, t: jnp.tanh(dw_flat(f, t)) + f, xh, tdw,
          label="F3c flat tanh(dw(x))+x")

    # --- F5: LN ---
    def ln_flat(f, g, b):
        u = jnp.sum(f, axis=0, keepdims=True, dtype=jnp.float32) / C
        m2 = jnp.sum(jnp.square(f.astype(jnp.float32)), axis=0, keepdims=True) / C
        s = jnp.maximum(m2 - u * u, 0.0)
        return (g * ((f.astype(jnp.float32) - u) * jax.lax.rsqrt(s + 1e-6)) + b).astype(f.dtype)

    timed(ln_flat, xf, g, bta, label="F5 flat LN (36ch)")

    # --- F4: full IEL flat vs current ---
    w_pi = jnp.asarray(rng.standard_normal((1, 1, C, 2 * CH)) * 0.1, dt16)
    w_dw = jnp.asarray(rng.standard_normal((3, 3, 1, 2 * CH)) * 0.1, dt16)
    w_dw1 = jnp.asarray(rng.standard_normal((3, 3, 1, CH)) * 0.1, dt16)
    w_dw2 = jnp.asarray(rng.standard_normal((3, 3, 1, CH)) * 0.1, dt16)
    w_po = jnp.asarray(rng.standard_normal((1, 1, CH, C)) * 0.1, dt16)

    def iel_nhcw(x, w_pi, w_dw, w_dw1, w_dw2, w_po):
        cv = lambda x, w: jax.lax.conv_general_dilated(x, w, (1, 1), "VALID", dimension_numbers=DN)
        dw = lambda x, w: jax.lax.conv_general_dilated(x, w, (1, 1), "SAME", dimension_numbers=DN,
                                                       feature_group_count=x.shape[2])
        x1 = dw(cv(x, w_pi[..., :CH]), w_dw[..., :CH])
        x2 = dw(cv(x, w_pi[..., CH:]), w_dw[..., CH:])
        x1 = jnp.tanh(dw(x1, w_dw1)) + x1
        x2 = jnp.tanh(dw(x2, w_dw2)) + x2
        return cv(x1 * x2, w_po)

    timed(iel_nhcw, x, w_pi, w_dw, w_dw1, w_dw2, w_po, label="F4a IEL current NHCW (XLA)")

    wpi_f = jnp.asarray(w_pi[0, 0].T, dt16)                       # (190, 36)
    tdw2 = jnp.asarray(w_dw[:, :, 0, :].reshape(9, 2 * CH, 1), dt16)
    tdw_1 = jnp.asarray(w_dw1[:, :, 0, :].reshape(9, CH, 1), dt16)
    tdw_2 = jnp.asarray(w_dw2[:, :, 0, :].reshape(9, CH, 1), dt16)
    wpo_f = jnp.asarray(w_po[0, 0].T, dt16)                       # (36, 95)

    def iel_flat(f, wpi_f, tdw2, tdw_1, tdw_2, wpo_f):
        m = jax.lax.dot_general(wpi_f, f, (((1,), (0,)), ((), ())))  # (190, N)
        m = dw_flat(m, tdw2)
        x1, x2 = m[:CH], m[CH:]
        x1 = jnp.tanh(dw_flat(x1, tdw_1)) + x1
        x2 = jnp.tanh(dw_flat(x2, tdw_2)) + x2
        return jax.lax.dot_general(wpo_f, x1 * x2, (((1,), (0,)), ((), ())))

    timed(iel_flat, xf, wpi_f, tdw2, tdw_1, tdw_2, wpo_f, label="F4b IEL flat (XLA)")

    def iel_flat_ln(f, g, b, *w):
        return iel_flat(ln_flat(f, g, b), *w)

    timed(iel_flat_ln, xf, g, bta, wpi_f, tdw2, tdw_1, tdw_2, wpo_f,
          label="F4c LN+IEL flat (XLA)")

    # numerical check flat vs NHCW (fp32)
    f32 = lambda t: t.astype(jnp.float32)
    ref = iel_nhcw(f32(x), f32(w_pi), f32(w_dw), f32(w_dw1), f32(w_dw2), f32(w_po))
    alt = jax.jit(lambda x: from_flat(
        iel_flat(to_flat(f32(x)), f32(wpi_f), f32(tdw2), f32(tdw_1), f32(tdw_2), f32(wpo_f))
    ))(f32(x))
    print("F4 parity fp32 |diff|max:", float(jnp.max(jnp.abs(ref - alt))))


if __name__ == "__main__":
    main()
