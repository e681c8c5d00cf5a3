"""Round-2 microbenchmarks: where does the 810 ms forward go, and which
formulations cut HBM traffic?

Hypothesis from round 1 numbers: everything is bandwidth-bound (1x1 convs at
11.5 TF/s == half the bandwidth ceiling for K=36; dw stack pure VPU; ~370 ms
of the forward is unattributed elementwise/LN passes).  Candidates:

  A. 1x1 conv as conv_general_dilated vs reshape+dot_general (fusion across
     the op boundary with elementwise producers/consumers).
  B. dw3x3 conv as conv_general_dilated vs pure-jnp shift-fma (9 padded
     slices; fusible with tanh/add/mult neighbors).
  C. dw(1x1(x)) folded into one dense 3x3 conv via the rank-1 weight
     product (k[dy,dx,c] * W[i,c]) — trades 9x MXU FLOPs on the 1x1 for
     removing the dw pass entirely.
  D. LN -> conv boundary: does XLA fuse the LN apply into the conv input?

Methodology: iterate inside one jit program via a chained scan (tunnel adds
3-6 ms per dispatched program; block_until_ready can return early — fetch a
scalar).  Shapes: level-1 of the 600x400 batch-128 bench (B=128, H=200,
C=36, W=300) in NHCW bf16, the hottest LCA site.
"""

from __future__ import annotations

import functools
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

DN = ("NHCW", "HWIO", "NHCW")


def timed(fn, *args, iters=20, label=""):
    @jax.jit
    def loop(*a):
        def body(carry, _):
            y = fn(a[0] + carry, *a[1:])
            return jnp.sum(y[(0,) * (y.ndim - 1)]).astype(a[0].dtype) * 1e-12, None

        final, _ = jax.lax.scan(body, jnp.zeros((), a[0].dtype), None, length=iters)
        return final

    _ = float(loop(*args))
    t0 = time.perf_counter()
    _ = float(loop(*args))
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{label:55s} {dt:8.3f} ms")
    return dt


def main():
    rng = np.random.default_rng(0)
    B, H, C, W = 32, 200, 36, 300  # level-1, quarter of bench batch (VMEM headroom)
    CH = 95  # IEL hidden at dim 36
    dt16 = jnp.bfloat16

    x = jnp.asarray(rng.standard_normal((B, H, C, W)), dt16)
    w1 = jnp.asarray(rng.standard_normal((1, 1, C, CH)) * 0.1, dt16)
    wdw = jnp.asarray(rng.standard_normal((3, 3, 1, CH)) * 0.1, dt16)
    wdw36 = jnp.asarray(rng.standard_normal((3, 3, 1, C)) * 0.1, dt16)
    xh = jnp.asarray(rng.standard_normal((B, H, CH, W)), dt16)
    g = jnp.asarray(rng.standard_normal((C,)) * 0.1 + 1, jnp.float32)
    bta = jnp.asarray(rng.standard_normal((C,)) * 0.1, jnp.float32)

    print(f"shapes: x=({B},{H},{C},{W}) bf16, hidden={CH}")

    # --- A: 1x1 conv formulations --------------------------------------
    def conv1x1_conv(x, w):
        return jax.lax.conv_general_dilated(x, w, (1, 1), "VALID", dimension_numbers=DN)

    def conv1x1_dot(x, w):
        b, h, c, ww = x.shape
        m = jnp.einsum("bhcw,co->bhow", x, w.reshape(c, -1))
        return m

    timed(conv1x1_conv, x, w1, label="A1 conv1x1 as conv_general (36->95)")
    timed(conv1x1_dot, x, w1, label="A2 conv1x1 as einsum bhcw,co->bhow")

    # with elementwise neighbors (tanh consumer + add producer)
    def conv_then_tanh(x, w):
        return jnp.tanh(conv1x1_conv(x * 1.0001 + 0.001, w))

    def dot_then_tanh(x, w):
        return jnp.tanh(conv1x1_dot(x * 1.0001 + 0.001, w))

    timed(conv_then_tanh, x, w1, label="A3 elem -> conv1x1 -> tanh (conv form)")
    timed(dot_then_tanh, x, w1, label="A4 elem -> einsum -> tanh (dot form)")

    # --- B: depthwise conv formulations --------------------------------
    def dw_conv(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=DN, feature_group_count=x.shape[2]
        )

    def dw_shiftfma(x, w):
        # 9 taps as padded H/W slices; W slices are lane-offset.
        out = None
        for dy in range(3):
            for dx in range(3):
                k = w[dy, dx, 0, :].reshape(1, 1, -1, 1).astype(x.dtype)
                sl = jax.lax.pad(
                    x,
                    jnp.zeros((), x.dtype),
                    ((0, 0, 0), (1 - dy, dy - 1, 0), (0, 0, 0), (1 - dx, dx - 1, 0)),
                )
                term = sl * k
                out = term if out is None else out + term
        return out

    timed(dw_conv, xh, wdw, label="B1 dw3x3 as conv_general (95ch)")
    timed(dw_shiftfma, xh, wdw, label="B2 dw3x3 as 9x pad-shift fma (95ch)")

    def dw_tanh_add_conv(x, w):
        return jnp.tanh(dw_conv(x, w)) + x

    def dw_tanh_add_shift(x, w):
        return jnp.tanh(dw_shiftfma(x, w)) + x

    timed(dw_tanh_add_conv, xh, wdw, label="B3 tanh(dw(x))+x (conv form)")
    timed(dw_tanh_add_shift, xh, wdw, label="B4 tanh(dw(x))+x (shift form)")

    # --- C: dw(1x1(x)) folded to dense 3x3 ------------------------------
    def dw_of_1x1(x, w1, wdw):
        return dw_conv(conv1x1_conv(x, w1), wdw)

    def folded_dense(x, w1, wdw):
        wd = wdw[:, :, 0, :][:, :, None, :] * w1[0, 0][None, None, :, :]  # (3,3,C,CH)
        return jax.lax.conv_general_dilated(x, wd, (1, 1), "SAME", dimension_numbers=DN)

    timed(dw_of_1x1, x, w1, wdw, label="C1 dw3x3(conv1x1(x)) two ops")
    timed(folded_dense, x, w1, wdw, label="C2 folded dense 3x3 conv 36->95")

    # --- D: LN -> conv boundary -----------------------------------------
    from hvi_cidnet_tpu.ops.conv import layer_norm_channels

    def ln_only(x, g, b):
        return layer_norm_channels(x, g, b)

    def conv_only(x, w):
        return conv1x1_conv(x, w)

    def ln_conv(x, g, b, w):
        return conv1x1_conv(layer_norm_channels(x, g, b), w)

    def ln_dot(x, g, b, w):
        return conv1x1_dot(layer_norm_channels(x, g, b), w)

    timed(ln_only, x, g, bta, label="D1 LN alone (36ch)")
    timed(conv_only, x, w1, label="D2 conv1x1 alone")
    timed(ln_conv, x, g, bta, w1, label="D3 LN -> conv1x1")
    timed(ln_dot, x, g, bta, w1, label="D4 LN -> einsum")

    # --- E: full IEL formulations ---------------------------------------
    w_pi = jnp.asarray(rng.standard_normal((1, 1, C, 2 * CH)) * 0.1, dt16)
    w_dw = jnp.asarray(rng.standard_normal((3, 3, 1, 2 * CH)) * 0.1, dt16)
    w_dw1 = jnp.asarray(rng.standard_normal((3, 3, 1, CH)) * 0.1, dt16)
    w_dw2 = jnp.asarray(rng.standard_normal((3, 3, 1, CH)) * 0.1, dt16)
    w_po = jnp.asarray(rng.standard_normal((1, 1, CH, C)) * 0.1, dt16)

    def iel_current(x, w_pi, w_dw, w_dw1, w_dw2, w_po):
        x1 = dw_conv(conv1x1_conv(x, w_pi[..., :CH]), w_dw[..., :CH])
        x2 = dw_conv(conv1x1_conv(x, w_pi[..., CH:]), w_dw[..., CH:])
        x1 = jnp.tanh(dw_conv(x1, w_dw1)) + x1
        x2 = jnp.tanh(dw_conv(x2, w_dw2)) + x2
        return conv1x1_conv(x1 * x2, w_po)

    def iel_folded_shift(x, w_pi, w_dw, w_dw1, w_dw2, w_po):
        # fold 1x1+dw into dense 3x3; run second dw as shift-fma; all
        # elementwise ops fusible.
        wd1 = w_dw[:, :, 0, :CH][:, :, None, :] * w_pi[0, 0, :, :CH][None, None]
        wd2 = w_dw[:, :, 0, CH:][:, :, None, :] * w_pi[0, 0, :, CH:][None, None]
        x1 = jax.lax.conv_general_dilated(x, wd1, (1, 1), "SAME", dimension_numbers=DN)
        x2 = jax.lax.conv_general_dilated(x, wd2, (1, 1), "SAME", dimension_numbers=DN)
        x1 = jnp.tanh(dw_shiftfma(x1, w_dw1)) + x1
        x2 = jnp.tanh(dw_shiftfma(x2, w_dw2)) + x2
        return conv1x1_conv(x1 * x2, w_po)

    timed(iel_current, x, w_pi, w_dw, w_dw1, w_dw2, w_po, label="E1 IEL current form")
    timed(iel_folded_shift, x, w_pi, w_dw, w_dw1, w_dw2, w_po, label="E2 IEL folded+shift form")

    # numerical check of the folded form
    f32 = lambda t: t.astype(jnp.float32)
    ref = iel_current(f32(x), f32(w_pi), f32(w_dw), f32(w_dw1), f32(w_dw2), f32(w_po))
    alt = iel_folded_shift(f32(x), f32(w_pi), f32(w_dw), f32(w_dw1), f32(w_dw2), f32(w_po))
    print("E parity fp32 |diff|max:", float(jnp.max(jnp.abs(ref - alt))))


if __name__ == "__main__":
    main()
