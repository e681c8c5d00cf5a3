"""CIDNet building blocks as pure functions over a flat parameter dict.

Parameter trees in this framework are flat ``{name: array}`` dicts whose keys
equal the reference's ``state_dict()`` keys (e.g. ``"HV_LCA1.ffn.q.weight"``)
with values already in TPU layout (HWIO convs, (C,) norms).  That makes the
``.pth``/safetensors converter a name-preserving layout transform and keeps
per-tensor parity testable, while remaining a perfectly ordinary JAX pytree
for jit/grad/sharding.

Every block documents its reference counterpart with file:line.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from hvi_cidnet_tpu.ops.conv import (
    conv1x1,
    conv2d,
    dwconv3x3,
    layer_norm_channels,
    prelu,
)
from hvi_cidnet_tpu.ops.resize import scale_double, scale_half

Params = dict


def layer_norm(p: Params, prefix: str, x: jnp.ndarray) -> jnp.ndarray:
    """LayerNorm, channels_first semantics (net/transformer_utils.py:5-29)."""
    return layer_norm_channels(x, p[prefix + ".weight"], p[prefix + ".bias"])


def norm_downsample(p: Params, prefix: str, x: jnp.ndarray, *, use_norm: bool = False) -> jnp.ndarray:
    """3x3 conv -> bilinear x0.5 -> PReLU -> optional LN.

    Reference NormDownsample (net/transformer_utils.py:31-48).
    """
    x = conv2d(x, p[prefix + ".down.0.weight"], padding="SAME")
    x = scale_half(x)
    x = prelu(x, p[prefix + ".prelu.weight"])
    if use_norm:
        x = layer_norm(p, prefix + ".norm", x)
    return x


def norm_upsample(p: Params, prefix: str, x: jnp.ndarray, y: jnp.ndarray, *, use_norm: bool = False) -> jnp.ndarray:
    """3x3 conv -> bilinear x2 -> concat skip -> 1x1 conv -> PReLU -> opt LN.

    Reference NormUpsample (net/transformer_utils.py:50-70).
    """
    x = conv2d(x, p[prefix + ".up_scale.0.weight"], padding="SAME")
    x = scale_double(x)
    x = jnp.concatenate([x, y], axis=-1)
    x = conv1x1(x, p[prefix + ".up.weight"])
    x = prelu(x, p[prefix + ".prelu.weight"])
    if use_norm:
        x = layer_norm(p, prefix + ".norm", x)
    return x


def _split_heads(x: jnp.ndarray, heads: int) -> jnp.ndarray:
    """(B,H,W,C) -> (B, heads, C/heads, H*W).

    Matches the reference's ``rearrange('b (head c) h w -> b head c (h w)')``
    (net/LCA.py:26-28): torch channel index c = head * c_ph + i, and our NHWC
    channel axis preserves that index after conversion.
    """
    b, h, w, c = x.shape
    x = x.reshape(b, h * w, heads, c // heads)
    return x.transpose(0, 2, 3, 1)


def _merge_heads(x: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """(B, heads, c_ph, H*W) -> (B,H,W,C)."""
    b, heads, cp, _ = x.shape
    return x.transpose(0, 3, 1, 2).reshape(b, h, w, heads * cp)


def channel_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    temperature: jnp.ndarray,
    heads: int,
    *,
    normalize_qk: bool = True,
) -> jnp.ndarray:
    """Transposed (channel-wise) attention core shared by CAB and TNSM.

    q/k/v: (B,H,W,C) feature maps.  Computes a per-head c_ph x c_ph attention
    matrix over the flattened spatial axis — cost linear in H*W, and both
    contractions are MXU matmuls.  Softmax runs in fp32 (bf16-sensitive).

    Reference: CAB.forward (net/LCA.py:26-36); TNSM's variant skips the L2
    normalization (net/TNSM.py:98-104).
    """
    _, h, w, _ = q.shape
    qh = _split_heads(q, heads)
    kh = _split_heads(k, heads)
    vh = _split_heads(v, heads)

    if normalize_qk:
        # torch F.normalize(dim=-1): x / max(||x||_2, eps) with eps=1e-12
        qh = qh / jnp.maximum(jnp.linalg.norm(qh, axis=-1, keepdims=True), 1e-12)
        kh = kh / jnp.maximum(jnp.linalg.norm(kh, axis=-1, keepdims=True), 1e-12)

    attn = jnp.einsum("bhcn,bhdn->bhcd", qh, kh, preferred_element_type=jnp.float32)
    attn = attn * temperature.reshape(1, heads, 1, 1).astype(jnp.float32)
    attn = jax.nn.softmax(attn, axis=-1)
    out = jnp.einsum("bhcd,bhdn->bhcn", attn.astype(vh.dtype), vh, preferred_element_type=jnp.float32)
    return _merge_heads(out.astype(q.dtype), h, w)


def cab(p: Params, prefix: str, x: jnp.ndarray, y: jnp.ndarray, heads: int) -> jnp.ndarray:
    """Cross-attention block: q from x, k/v from y (net/LCA.py:7-41)."""
    q = dwconv3x3(conv1x1(x, p[prefix + ".q.weight"]), p[prefix + ".q_dwconv.weight"])
    kv = dwconv3x3(conv1x1(y, p[prefix + ".kv.weight"]), p[prefix + ".kv_dwconv.weight"])
    k, v = jnp.split(kv, 2, axis=-1)
    out = channel_attention(q, k, v, p[prefix + ".temperature"], heads)
    return conv1x1(out, p[prefix + ".project_out.weight"])


def iel(p: Params, prefix: str, x: jnp.ndarray) -> jnp.ndarray:
    """Intensity Enhancement Layer — gated tanh FFN (net/LCA.py:45-67)."""
    x = conv1x1(x, p[prefix + ".project_in.weight"])
    x = dwconv3x3(x, p[prefix + ".dwconv.weight"])
    x1, x2 = jnp.split(x, 2, axis=-1)
    x1 = jnp.tanh(dwconv3x3(x1, p[prefix + ".dwconv1.weight"])) + x1
    x2 = jnp.tanh(dwconv3x3(x2, p[prefix + ".dwconv2.weight"])) + x2
    return conv1x1(x1 * x2, p[prefix + ".project_out.weight"])


def hv_lca(p: Params, prefix: str, x: jnp.ndarray, y: jnp.ndarray, heads: int) -> jnp.ndarray:
    """``x + CAB(LN(x), LN(y))`` then IEL(LN(x)) — NOT residual on the IEL.

    Reference HV_LCA (net/LCA.py:71-81).
    """
    x = x + cab(p, prefix + ".ffn", layer_norm(p, prefix + ".norm", x), layer_norm(p, prefix + ".norm", y), heads)
    return iel(p, prefix + ".gdfn", layer_norm(p, prefix + ".norm", x))


def i_lca(p: Params, prefix: str, x: jnp.ndarray, y: jnp.ndarray, heads: int) -> jnp.ndarray:
    """Like hv_lca but with residual on the IEL (net/LCA.py:83-93)."""
    x = x + cab(p, prefix + ".ffn", layer_norm(p, prefix + ".norm", x), layer_norm(p, prefix + ".norm", y), heads)
    return x + iel(p, prefix + ".gdfn", layer_norm(p, prefix + ".norm", x))


def spatial_attention(p: Params, prefix: str, x: jnp.ndarray) -> jnp.ndarray:
    """avg+max channel pool -> 7x7 conv -> sigmoid gate.

    Reference SpatialAttention (net/CIDNet_MSSA.py:10-25).
    """
    avg_out = jnp.mean(x, axis=-1, keepdims=True)
    max_out = jnp.max(x, axis=-1, keepdims=True)
    y = jnp.concatenate([avg_out, max_out], axis=-1)
    y = conv2d(y, p[prefix + ".conv1.weight"], padding="SAME")
    return x * jax.nn.sigmoid(y)
