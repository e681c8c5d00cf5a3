"""HVI color-space transform, TPU-native (pure JAX functions).

Re-designs the reference's stateful ``RGB_HVI`` module
(``net/HVI_transform.py:6-122``) as pure functions over NHWC images:

* ``rgb_to_hvi(img, k)``   — reference ``RGB_HVI.HVIT``   (HVI_transform.py:16-47)
* ``hvi_to_rgb(hvi, k, gates)`` — reference ``RGB_HVI.PHVIT`` (HVI_transform.py:49-122)

Differences from the reference, by design:

* **Functional k-threading.** The reference caches ``self.this_k = k.item()``
  inside HVIT (a device→host sync) and silently reuses it in PHVIT
  (HVI_transform.py:38,59).  Here ``k`` is passed explicitly; callers replicate
  the reference's gradient semantics by passing ``stop_gradient(k)`` to
  ``hvi_to_rgb`` (PHVIT consumed a detached python float, so gradients flow to
  ``density_k`` only through HVIT).
* **Select-chains instead of boolean-mask scatter.** The reference assigns
  through boolean masks sequentially (B-max, then G-max, then R-max, then
  gray — HVI_transform.py:23-27), so ties resolve with a fixed priority.  The
  ``jnp.where`` chain below applies the same updates in the same order, which
  yields the same priority (later updates win).
* **fp32 island.** trig/atan2/pow are precision-sensitive; computation is done
  in fp32 regardless of input dtype and cast back on exit.

Eval-time gates (reference ``gated``/``gated2``/``alpha``/``alpha_s``,
HVI_transform.py:10-13,69-70,120-121) are plain keyword arguments.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

PI = 3.141592653589793
_EPS = 1e-8


def color_sensitive(intensity: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    """``(sin(I*pi/2) + eps) ** k`` — intensity-collapse factor.

    Reference: HVI_transform.py:40 (HVIT) and :60 (PHVIT).
    """
    return jnp.power(jnp.sin(intensity * (0.5 * PI)) + _EPS, k)


def rgb_to_hvi(img: jnp.ndarray, k: jnp.ndarray, *, channel_axis: int = -1) -> jnp.ndarray:
    """RGB -> HVI. ``img``: [0, 1] RGB with 3 channels on ``channel_axis``
    (default NHWC; the serving path passes the HWCB internal layout with
    ``channel_axis=2`` so the transform runs with batch in lanes and no
    boundary transposes).  ``k``: scalar (density_k).

    Returns the same layout with channels (H, V, I).
    Reference: RGB_HVI.HVIT, HVI_transform.py:16-47.
    """
    dtype_in = img.dtype
    ax = channel_axis % img.ndim
    x = img.astype(jnp.float32)
    r = jax.lax.index_in_dim(x, 0, ax, keepdims=False)
    g = jax.lax.index_in_dim(x, 1, ax, keepdims=False)
    b = jax.lax.index_in_dim(x, 2, ax, keepdims=False)

    value = jnp.max(x, axis=ax)     # HVI_transform.py:21
    img_min = jnp.min(x, axis=ax)   # :22
    denom = value - img_min + _EPS

    # Sequential boolean-mask writes (:23-27): B-max first, then G-max, then
    # R-max, then gray.  Later writes win, so build the chain bottom-up with
    # the *last* write outermost.
    hue = jnp.where(b == value, 4.0 + (r - g) / denom, 0.0)
    hue = jnp.where(g == value, 2.0 + (b - r) / denom, hue)
    hue = jnp.where(r == value, jnp.mod((g - b) / denom, 6.0), hue)
    hue = jnp.where(img_min == value, 0.0, hue)
    hue = hue / 6.0  # :28

    saturation = (value - img_min) / (value + _EPS)  # :30
    saturation = jnp.where(value == 0, 0.0, saturation)  # :31

    k32 = jnp.asarray(k, jnp.float32).reshape(())
    cs = color_sensitive(value, k32)           # :40
    ch = jnp.cos(2.0 * PI * hue)               # :41
    cv = jnp.sin(2.0 * PI * hue)               # :42
    h_out = cs * saturation * ch               # :43
    v_out = cs * saturation * cv               # :44
    return jnp.stack([h_out, v_out, value], axis=ax).astype(dtype_in)


def hvi_to_rgb(
    hvi: jnp.ndarray,
    k: jnp.ndarray,
    *,
    gated: bool = False,
    gated2: bool = False,
    alpha: float = 1.0,
    alpha_s: float = 1.3,
    channel_axis: int = -1,
) -> jnp.ndarray:
    """HVI -> RGB. ``hvi``: channels (H, V, I) on ``channel_axis`` (default
    NHWC; ``channel_axis=2`` for the HWCB serving layout).

    ``k`` should already be gradient-detached by the caller when matching the
    reference (PHVIT consumed ``self.this_k``, a python float).
    Reference: RGB_HVI.PHVIT, HVI_transform.py:49-122.
    """
    dtype_in = hvi.dtype
    ax = channel_axis % hvi.ndim
    x = hvi.astype(jnp.float32)
    h_c = jnp.clip(jax.lax.index_in_dim(x, 0, ax, keepdims=False), -1.0, 1.0)   # :54
    v_c = jnp.clip(jax.lax.index_in_dim(x, 1, ax, keepdims=False), -1.0, 1.0)   # :55
    i_c = jnp.clip(jax.lax.index_in_dim(x, 2, ax, keepdims=False), 0.0, 1.0)    # :56

    k32 = jnp.asarray(k, jnp.float32).reshape(())
    cs = color_sensitive(i_c, k32)          # :60
    h_c = jnp.clip(h_c / (cs + _EPS), -1.0, 1.0)  # :61,63
    v_c = jnp.clip(v_c / (cs + _EPS), -1.0, 1.0)  # :62,64

    h = jnp.mod(jnp.arctan2(v_c + _EPS, h_c + _EPS) / (2.0 * PI), 1.0)  # :65-66
    s = jnp.sqrt(h_c * h_c + v_c * v_c + _EPS)                          # :67

    if gated:
        s = s * alpha_s  # :69-70

    s = jnp.clip(s, 0.0, 1.0)   # :72
    v = jnp.clip(i_c, 0.0, 1.0)  # :73

    hi = jnp.floor(h * 6.0)   # :79
    f = h * 6.0 - hi          # :80
    p = v * (1.0 - s)         # :81
    q = v * (1.0 - f * s)     # :82
    t = v * (1.0 - (1.0 - f) * s)  # :83

    # Classic 6-sector HSV->RGB (:85-114).  Sectors are disjoint; h == 1.0
    # exactly gives hi == 6 -> all masks false -> rgb stays 0, replicating the
    # reference's zeros-init behavior.
    zero = jnp.zeros_like(h)
    r = zero
    g = zero
    b = zero
    for sector, (rr, gg, bb) in enumerate(
        [(v, t, p), (q, v, p), (p, v, t), (p, q, v), (t, p, v), (v, p, q)]
    ):
        m = hi == sector
        r = jnp.where(m, rr, r)
        g = jnp.where(m, gg, g)
        b = jnp.where(m, bb, b)

    rgb = jnp.stack([r, g, b], axis=ax)
    if gated2:
        rgb = rgb * alpha  # :120-121
    return rgb.astype(dtype_in)


def hvi_roundtrip(img: jnp.ndarray, k: jnp.ndarray, **gates) -> jnp.ndarray:
    """RGB -> HVI -> RGB with reference gradient semantics for ``k``."""
    hvi = rgb_to_hvi(img, k)
    return hvi_to_rgb(hvi, jax.lax.stop_gradient(k), **gates)
