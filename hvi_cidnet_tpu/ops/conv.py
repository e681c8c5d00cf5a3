"""Convolution and norm primitives in the framework's NHCW internal layout.

Activations inside the model are **NHCW** — (batch, height, channels, width).
With XLA-TPU's default minor-two-dims (8, 128) tiling this puts channels in
sublanes (36 -> 40 pad) and width in lanes (600 -> 640), a ~1.19x physical
expansion — versus **3.6x** for channels-last, where C=36 pads to 128 lanes
(measured from an XLA HBM dump; the layout switch is worth ~1.4x on convs and
elementwise alike).  The public model API stays NHWC; ``models/cidnet.py``
transposes the 3-channel image once at each boundary.

Weights are stored HWIO (kh, kw, in/groups, out) exactly as for NHWC — only
``dimension_numbers`` changes — so the torch-checkpoint converter is
layout-independent.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# (batch, height, channels, width) activations, HWIO weights.
_DN = ("NHCW", "HWIO", "NHCW")

CH_AXIS = 2  # channel axis of the internal activation layout


def nhwc_to_internal(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.transpose(x, (0, 1, 3, 2))


def internal_to_nhwc(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.transpose(x, (0, 1, 3, 2))


def conv2d(
    x: jnp.ndarray,
    w: jnp.ndarray,
    *,
    stride: int = 1,
    padding="SAME",
    groups: int = 1,
) -> jnp.ndarray:
    """2-D convolution on NHCW ``x``. ``padding``: 'SAME'/'VALID'/explicit.

    No preferred_element_type: the TPU MXU accumulates bf16 convs in fp32
    internally, and jax 0.9's conv transpose rule rejects mixed-dtype
    cotangents when an explicit upcast is requested.
    """
    return jax.lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(stride, stride),
        padding=padding,
        dimension_numbers=_DN,
        feature_group_count=groups,
    )


def conv1x1(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Pointwise conv. ``w``: (1, 1, C_in, C_out)."""
    return conv2d(x, w, padding="VALID")


def dwconv3x3(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Depthwise 3x3, zero 'SAME' padding (torch padding=1).

    ``w``: (3, 3, 1, C).  Used throughout CAB/IEL (net/LCA.py:14,16,53-55).
    """
    return conv2d(x, w, padding="SAME", groups=x.shape[CH_AXIS])


def replication_pad(x: jnp.ndarray, pad: int = 1) -> jnp.ndarray:
    """``nn.ReplicationPad2d`` — edge padding on H and W (net/CIDNet.py:22)."""
    return jnp.pad(x, ((0, 0), (pad, pad), (0, 0), (pad, pad)), mode="edge")


def conv3x3_replpad(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """ReplicationPad2d(1) + Conv2d(k=3, padding=0) stem/head blocks.

    Reference: the ``nn.Sequential`` stems HVE_block0/IE_block0 and heads
    HVD_block0/ID_block0 (net/CIDNet.py:21-24,32-35,39-42,50-53).
    Routes through the Pallas conv kernel on TPU (ops/conv_pallas.py).
    """
    from hvi_cidnet_tpu.ops.conv_pallas import conv3x3_nhcw

    return conv3x3_nhcw(x, w.astype(x.dtype), "edge")


def conv3x3_same(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Dense 3x3 stride-1 zero-SAME conv (NormDown/Up 3x3s), Pallas on TPU."""
    from hvi_cidnet_tpu.ops.conv_pallas import conv3x3_nhcw

    return conv3x3_nhcw(x, w.astype(x.dtype), "zero")


def prelu(x: jnp.ndarray, a: jnp.ndarray) -> jnp.ndarray:
    """PReLU with a single shared slope (torch ``nn.PReLU()`` default)."""
    a = jnp.asarray(a).reshape(()).astype(x.dtype)
    return jnp.maximum(x, 0) + a * jnp.minimum(x, 0)


def layer_norm_channels(x: jnp.ndarray, weight: jnp.ndarray, bias: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """Channel LayerNorm over the NHCW channel axis.

    Matches the reference's channels-first manual norm
    (net/transformer_utils.py:24-29): biased variance, eps inside the sqrt.

    fp32 inputs use the exact two-pass form (parity-tested).  bf16 inputs
    keep the *statistics* in fp32 via fused converting reduces
    (E[x^2] - E[x]^2) without materializing an fp32 activation copy —
    profiling showed the cast-up/cast-down variant spending ~12% of the
    forward in convert_element_type passes.
    """
    w = weight.reshape(1, 1, -1, 1)
    b = bias.reshape(1, 1, -1, 1)
    if x.dtype == jnp.float32:
        u = jnp.mean(x, axis=CH_AXIS, keepdims=True)
        d = x - u
        s = jnp.mean(d * d, axis=CH_AXIS, keepdims=True)
        y = d * jax.lax.rsqrt(s + eps)
        return w * y + b
    dt = x.dtype
    n = x.shape[CH_AXIS]
    u = jnp.sum(x, axis=CH_AXIS, keepdims=True, dtype=jnp.float32) / n
    m2 = jnp.sum(jnp.square(x.astype(jnp.float32)), axis=CH_AXIS, keepdims=True) / n
    s = jnp.maximum(m2 - u * u, 0.0)
    scale = jax.lax.rsqrt(s + eps).astype(dt)
    shift = u.astype(dt)
    return w.astype(dt) * ((x - shift) * scale) + b.astype(dt)
