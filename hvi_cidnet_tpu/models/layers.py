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

import numpy as np
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
    contractions are MXU matmuls.  The head split is a pure reshape
    (B,HW,heads,c_ph) and the einsums contract straight over the spatial
    axis, so no transposed copy of the (large) feature map is materialized.
    Softmax runs in fp32 (bf16-sensitive).

    Head semantics match the reference's ``rearrange('b (head c) h w ->
    b head c (h w)')`` (net/LCA.py:26-28): torch channel index
    c = head * c_ph + i, preserved by our NHWC channel axis.
    TNSM's variant skips the L2 normalization (net/TNSM.py:98-104).
    """
    b, h, w, c = q.shape
    cp = c // heads
    n = h * w
    # Layout strategy: stay in (B, N, C) — a free reshape from NHWC, with C in
    # lanes and N in sublanes.  The score contraction runs over the sublane
    # axis (dot_general handles the transposed orientation natively on the
    # MXU), so NO transposed copy of the big feature map is ever
    # materialized.  Heads are handled by computing the full CxC score matrix
    # and masking it block-diagonal before the softmax — for c <= 144 the
    # extra FLOPs are trivial next to the transposes they replace (profiled:
    # 27% of device time was layout copies with the per-head layout).
    qh = q.reshape(b, n, c)
    kh = k.reshape(b, n, c)
    vh = v.reshape(b, n, c)

    if normalize_qk:
        # torch F.normalize over the spatial axis: x / max(||x||_2, 1e-12)
        def _norm(t):
            sq = jnp.sum(jnp.square(t.astype(jnp.float32)), axis=1, keepdims=True)
            return (t.astype(jnp.float32) * jax.lax.rsqrt(jnp.maximum(sq, 1e-24))).astype(t.dtype)

        qh = _norm(qh)
        kh = _norm(kh)

    scores = jnp.einsum("bnc,bnd->bcd", qh, kh, preferred_element_type=jnp.float32)
    # row c belongs to head c // cp; the reference scales row-wise by that
    # head's temperature (net/LCA.py:33)
    temp_per_c = jnp.repeat(temperature.reshape(heads).astype(jnp.float32), cp)
    scores = scores * temp_per_c[None, :, None]
    if heads > 1:
        head_id = np.arange(c) // cp
        block = jnp.asarray(head_id[:, None] == head_id[None, :])
        scores = jnp.where(block[None], scores, -jnp.inf)
    attn = jax.nn.softmax(scores, axis=-1)  # block-diag == per-head softmax
    out = jnp.einsum("bcd,bnd->bnc", attn.astype(vh.dtype), vh, preferred_element_type=jnp.float32)
    return out.astype(q.dtype).reshape(b, h, w, c)


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
