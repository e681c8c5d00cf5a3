"""Flat serving layout: activations as 2-D ``(C, H*W*B)`` with batch innermost.

The serving fast path flattens (H, W, C, B) activations to 2-D with C in
sublanes and everything else in lanes.  With B a multiple of 128 (one lane
tile), every convolution/resize tap is a *tile-aligned* lane offset —
free addressing inside Pallas kernels — and every 1x1 conv is a single
``(O, C) x (C, N)`` MXU matmul.  This is the layout the fused kernel family
(``ops/kernels_flat.py``) operates in; the reference-parity HWCB path
(``ops/conv.py``) remains the general-batch fallback.

Reference counterparts: the layout itself has none (pure TPU design); the
ops mirror net/transformer_utils.py and net/LCA.py math exactly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def flat_ok(batch: int) -> bool:
    """The flat path needs B % 128 == 0 so lane shifts stay tile-aligned."""
    return batch % 128 == 0


def to_flat(x_hwcb: jnp.ndarray) -> jnp.ndarray:
    """(H, W, C, B) -> (C, H*W*B)."""
    h, w, c, b = x_hwcb.shape
    return jnp.transpose(x_hwcb, (2, 0, 1, 3)).reshape(c, h * w * b)


def from_flat(f: jnp.ndarray, h: int, w: int, b: int) -> jnp.ndarray:
    """(C, H*W*B) -> (H, W, C, B)."""
    c = f.shape[0]
    return jnp.transpose(f.reshape(c, h, w, b), (1, 2, 0, 3))


def conv1x1_flat(f: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Pointwise conv as one MXU matmul.  ``w``: HWIO (1, 1, C, O)."""
    return jax.lax.dot_general(
        w[0, 0].T.astype(f.dtype), f, (((1,), (0,)), ((), ()))
    )


def layer_norm_flat(f: jnp.ndarray, weight: jnp.ndarray, bias: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """Channel LayerNorm on flat activations (C in sublanes)."""
    c = f.shape[0]
    w = weight.reshape(c, 1)
    b = bias.reshape(c, 1)
    if f.dtype == jnp.float32:
        u = jnp.mean(f, axis=0, keepdims=True)
        d = f - u
        s = jnp.mean(d * d, axis=0, keepdims=True)
        return w * (d * jax.lax.rsqrt(s + eps)) + b
    u = jnp.sum(f, axis=0, keepdims=True, dtype=jnp.float32) / c
    m2 = jnp.sum(jnp.square(f.astype(jnp.float32)), axis=0, keepdims=True) / c
    s = jnp.maximum(m2 - u * u, 0.0)
    scale = jax.lax.rsqrt(s + eps).astype(f.dtype)
    shift = u.astype(f.dtype)
    return w.astype(f.dtype) * ((f - shift) * scale) + b.astype(f.dtype)
