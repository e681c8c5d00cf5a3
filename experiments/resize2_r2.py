"""Resize formulations round 2: strided slices on MAJOR axes (HWCB).

Round-1 NHCW banned strided slices because W sat in lanes (gather loops).
In HWCB both H and W are major dims — x[0::2] selects alternate tile-rows,
which should be a cheap DMA pattern.  Measures:

  half:   banded-reshape (current) vs direct strided-slice fma
  double: stack+reshape (current) vs scatter-free interleave variants
  and each fused with the neighboring conv/PReLU (NormDown/Up context).
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from hvi_cidnet_tpu.ops.resize import _band_weights, _double_major, _half_major

dt16 = jnp.bfloat16
DN = ("HWCN", "HWIO", "HWCN")


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


def _wvec(vals, ndim, axis, dt):
    s = [1] * ndim
    s[axis] = len(vals)
    return jnp.asarray(np.asarray(vals), dt).reshape(s)


def half_strided(x, axis):
    h = x.shape[axis]
    oh = h // 2
    a, b, c = _band_weights(h, oh, [lambda i: 2 * i, lambda i: 2 * i + 1, lambda i: 2 * i + 2])
    ix = lambda s0, s1, step: tuple(
        slice(s0, s1, step) if d == axis else slice(None) for d in range(x.ndim)
    )
    e = x[ix(0, 2 * oh, 2)]
    o = x[ix(1, 2 * oh, 2)]
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, 1)
    n = jnp.pad(x[ix(2, h, 2)], pad)[tuple(slice(0, oh) if d == axis else slice(None) for d in range(x.ndim))]
    dt = x.dtype
    return e * _wvec(a, x.ndim, axis, dt) + o * _wvec(b, x.ndim, axis, dt) + n * _wvec(c, x.ndim, axis, dt)


def double_dus(x, axis):
    """x2 via two strided writes into a preallocated buffer."""
    h = x.shape[axis]
    oh = 2 * h
    ae_f, be_f = _band_weights(h, oh, [lambda i: i // 2 - 1, lambda i: i // 2])
    ao_f, bo_f = _band_weights(h, oh, [lambda i: i // 2, lambda i: i // 2 + 1])
    ae, be = ae_f[0::2], be_f[0::2]
    ao, bo = ao_f[1::2], bo_f[1::2]
    dt = x.dtype

    def shift(delta):
        s = [slice(None)] * x.ndim
        pad = [(0, 0)] * x.ndim
        if delta == -1:
            s[axis] = slice(0, h - 1)
            pad[axis] = (1, 0)
        else:
            s[axis] = slice(1, h)
            pad[axis] = (0, 1)
        return jnp.pad(x[tuple(s)], pad)

    oe = shift(-1) * _wvec(ae, x.ndim, axis, dt) + x * _wvec(be, x.ndim, axis, dt)
    oo = x * _wvec(ao, x.ndim, axis, dt) + shift(1) * _wvec(bo, x.ndim, axis, dt)
    shp = list(x.shape)
    shp[axis] = oh
    out = jnp.zeros(shp, dt)
    sl = lambda s0, step: tuple(slice(s0, None, step) if d == axis else slice(None) for d in range(x.ndim))
    out = out.at[sl(0, 2)].set(oe)
    return out.at[sl(1, 2)].set(oo)


def main():
    rng = np.random.default_rng(0)
    B = 128
    x0 = jnp.asarray(rng.standard_normal((400, 600, 36, B)), dt16)
    x1 = jnp.asarray(rng.standard_normal((200, 300, 36, B)), dt16)

    # correctness at a small shape (full-size eager parity OOMs the chip)
    xs = jnp.asarray(rng.standard_normal((64, 48, 36, 128)), dt16)
    ref = _half_major(_half_major(xs, 0), 1)
    alt = half_strided(half_strided(xs, 0), 1)
    print("half parity:", float(jnp.max(jnp.abs(ref.astype(jnp.float32) - alt.astype(jnp.float32)))))
    ref2 = _double_major(_double_major(xs, 0), 1)
    alt2 = double_dus(double_dus(xs, 0), 1)
    print("double parity:", float(jnp.max(jnp.abs(ref2.astype(jnp.float32) - alt2.astype(jnp.float32)))))

    timed(lambda x: _half_major(_half_major(x, 0), 1), x0, label="H1 half L0 banded-reshape (current)")
    timed(lambda x: half_strided(half_strided(x, 0), 1), x0, label="H2 half L0 strided-slice fma")
    timed(lambda x: _double_major(_double_major(x, 0), 1), x1, label="D1 double L1 stack-reshape (current)")
    timed(lambda x: double_dus(double_dus(x, 0), 1), x1, label="D2 double L1 strided dus")

    # NormDown context: conv + half + prelu
    w33 = jnp.asarray(rng.standard_normal((3, 3, 36, 36)) * 0.1, dt16)
    cv = lambda x, w: jax.lax.conv_general_dilated(x, w, (1, 1), "SAME", dimension_numbers=DN)
    pr = lambda t: jnp.maximum(t, 0) + 0.25 * jnp.minimum(t, 0)
    timed(lambda x, w: pr(_half_major(_half_major(cv(x, w), 0), 1)), x0, w33,
          label="H3 normdown banded (current)")
    timed(lambda x, w: pr(half_strided(half_strided(cv(x, w), 0), 1)), x0, w33,
          label="H4 normdown strided")
    # conv AFTER half is cheaper (4x fewer pixels) — but changes math; floor probe
    timed(lambda x, w: pr(cv(half_strided(half_strided(x, 0), 1), w)), x0, w33,
          label="H5 half->conv (not equivalent; probe)")


if __name__ == "__main__":
    main()
