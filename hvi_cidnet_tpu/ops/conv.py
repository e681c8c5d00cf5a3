"""Convolution primitives in TPU-native NHWC / HWIO layout.

All model weights in this framework are stored HWIO (kh, kw, in/groups, out);
the torch-checkpoint converter (``compat/torch_ckpt.py``) transposes the
reference's OIHW tensors on load.  bf16 activations x bf16 weights accumulate
in fp32 on the MXU via ``preferred_element_type``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_DN = ("NHWC", "HWIO", "NHWC")


def conv2d(
    x: jnp.ndarray,
    w: jnp.ndarray,
    *,
    stride: int = 1,
    padding="SAME",
    groups: int = 1,
) -> jnp.ndarray:
    """2-D convolution. ``padding`` is 'SAME', 'VALID', or explicit pairs."""
    # No preferred_element_type: the TPU MXU accumulates bf16 convs in fp32
    # internally and jax 0.9's conv transpose rule rejects mixed-dtype
    # cotangents when an explicit upcast is requested.
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
    return conv2d(x, w, padding="SAME", groups=x.shape[-1])


def replication_pad(x: jnp.ndarray, pad: int = 1) -> jnp.ndarray:
    """``nn.ReplicationPad2d`` — edge padding on H and W (net/CIDNet.py:22)."""
    return jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="edge")


def conv3x3_replpad(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """ReplicationPad2d(1) + Conv2d(k=3, padding=0) stem/head blocks.

    Reference: the ``nn.Sequential`` stems HVE_block0/IE_block0 and heads
    HVD_block0/ID_block0 (net/CIDNet.py:21-24,32-35,39-42,50-53).
    """
    return conv2d(replication_pad(x, 1), w, padding="VALID")


def prelu(x: jnp.ndarray, a: jnp.ndarray) -> jnp.ndarray:
    """PReLU with a single shared slope (torch ``nn.PReLU()`` default)."""
    a = a.reshape(()).astype(x.dtype)
    return jnp.maximum(x, 0) + a * jnp.minimum(x, 0)


def layer_norm_channels(x: jnp.ndarray, weight: jnp.ndarray, bias: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """Channel LayerNorm matching the reference's channels-first manual norm.

    Reference (net/transformer_utils.py:24-29): biased variance over the
    channel axis, eps inside the sqrt.

    fp32 inputs use the reference's exact two-pass form (parity-tested).
    bf16 inputs keep the *statistics* in fp32 via fused converting reduces
    (E[x^2] - E[x]^2) but never materialize an fp32 copy of the activation —
    profiling showed the naive cast-up/cast-down spending ~12% of the forward
    in convert_element_type passes.
    """
    if x.dtype == jnp.float32:
        u = jnp.mean(x, axis=-1, keepdims=True)
        d = x - u
        s = jnp.mean(d * d, axis=-1, keepdims=True)
        y = d * jax.lax.rsqrt(s + eps)
        return weight * y + bias
    dt = x.dtype
    n = x.shape[-1]
    u = jnp.sum(x, axis=-1, keepdims=True, dtype=jnp.float32) / n
    m2 = jnp.sum(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True) / n
    s = jnp.maximum(m2 - u * u, 0.0)
    scale = jax.lax.rsqrt(s + eps).astype(dt)
    shift = u.astype(dt)
    return weight.astype(dt) * ((x - shift) * scale) + bias.astype(dt)
