"""CIDNet building blocks as pure functions over a flat parameter dict.

Parameter trees are flat ``{name: array}`` dicts whose keys equal the
reference's ``state_dict()`` keys (e.g. ``"HV_LCA1.ffn.q.weight"``) with
values in HWIO layout — the ``.pth``/safetensors converter is name-preserving
and per-tensor parity testable, while the tree remains an ordinary JAX pytree
for jit/grad/sharding.

Activations flow in the **HWCB** internal layout (see ops/conv.py: batch in
lanes, channels in sublanes — XLA-TPU's preferred convolution layout, so no
layout-conversion copies appear between convs and their neighbors).  Every
block documents its reference counterpart with file:line.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from hvi_cidnet_tpu.ops.conv import (
    CH_AXIS,
    conv1x1,
    conv2d,
    conv3x3_same,
    dwconv3x3,
    prelu,
)
from hvi_cidnet_tpu.ops.iel_pallas import iel_branch
from hvi_cidnet_tpu.ops.norm_pallas import layer_norm_channels_fused
from hvi_cidnet_tpu.ops.pallas_gate import kernel_flag
from hvi_cidnet_tpu.ops.resize_pallas import double_bilinear, half_prelu
# channel attention lives in ops/attention.py (XLA einsum path + per-batch
# Pallas kernel behind a dispatching gate); re-exported for the model code
from hvi_cidnet_tpu.ops.attention import channel_attention  # noqa: F401

Params = dict


def _scoped(fn):
    """Trace the block under ``jax.named_scope(prefix)``.

    Pure metadata: optimized-HLO ``op_name`` then carries the model site
    (e.g. ``I_LCA5/...``), which is what lets the per-site pool attribution
    (experiments/pool_attrib_r4.py) name which residual add / relayout a
    traced instruction belongs to.  No numeric or cache-key effect.
    """

    @functools.wraps(fn)
    def wrapper(p, prefix, *args, **kwargs):
        with jax.named_scope(prefix):
            return fn(p, prefix, *args, **kwargs)

    return wrapper


@_scoped
def layer_norm(p: Params, prefix: str, x: jnp.ndarray) -> jnp.ndarray:
    """LayerNorm, channels_first semantics (net/transformer_utils.py:5-29).

    Serving batches take the fused Pallas kernel (stats + apply in one HBM
    read + write, ops/norm_pallas.py); other shapes the XLA fused-stats
    path."""
    return layer_norm_channels_fused(x, p[prefix + ".weight"], p[prefix + ".bias"])


@_scoped
def norm_downsample(p: Params, prefix: str, x: jnp.ndarray, *, use_norm: bool = False) -> jnp.ndarray:
    """3x3 conv -> bilinear x0.5 -> PReLU -> optional LN.

    Reference NormDownsample (net/transformer_utils.py:31-48).  The
    x0.5+PReLU tail runs as one Pallas kernel at lane-aligned batches
    (ops/resize_pallas.py: 31.6 -> 17.8 ms at the bench L0 site).
    """
    x = conv3x3_same(x, p[prefix + ".down.0.weight"])
    x = half_prelu(x, p[prefix + ".prelu.weight"].reshape(()))
    if use_norm:
        x = layer_norm(p, prefix + ".norm", x)
    return x


@_scoped
def norm_upsample(p: Params, prefix: str, x: jnp.ndarray, y: jnp.ndarray, *, use_norm: bool = False) -> jnp.ndarray:
    """3x3 conv -> bilinear x2 -> concat skip -> 1x1 conv -> PReLU -> opt LN.

    Reference NormUpsample (net/transformer_utils.py:50-70).
    """
    # concat + 1x1 conv == sum of two 1x1 convs on the operands (weights
    # sliced at trace time) — skips materializing the 2C concat tensor
    w3 = p[prefix + ".up_scale.0.weight"]
    w_up = p[prefix + ".up.weight"]
    cout = w_up.shape[-2] // 2
    if kernel_flag("upsample_fold"):
        # The up-side 1x1 conv commutes with the bilinear x2 (per-pixel
        # channel mixing vs per-channel spatial mixing, both linear):
        # conv1x1(double(z), W1) == double(conv1x1(z, W1)).  Composing W1
        # into the 3x3 conv's output channels at trace time therefore
        # deletes the full-res pointwise conv — one HBM read+write of the
        # block's LARGEST tensor — at zero FLOP/shape change to the 3x3.
        # Exact up to fp reassociation (composition is done in fp32).
        w3 = jnp.einsum(
            "hwim,mo->hwio",
            w3.astype(jnp.float32),
            w_up[0, 0, :cout, :].astype(jnp.float32),
        ).astype(w3.dtype)
        x = conv3x3_same(x, w3)
        # Pallas at lane-aligned batches: 48.4 -> 12.0 ms @L1
        x = double_bilinear(x)
        x = x + conv1x1(y, w_up[:, :, cout:, :])
    else:
        x = conv3x3_same(x, w3)
        x = double_bilinear(x)
        x = conv1x1(x, w_up[:, :, :cout, :]) + conv1x1(y, w_up[:, :, cout:, :])
    x = prelu(x, p[prefix + ".prelu.weight"])
    if use_norm:
        x = layer_norm(p, prefix + ".norm", x)
    return x


@_scoped
def cab(p: Params, prefix: str, x: jnp.ndarray, y: jnp.ndarray, heads: int) -> jnp.ndarray:
    """Cross-attention block: q from x, k/v from y (net/LCA.py:7-41).

    The kv conv's output channels are independent, so the torch
    ``kv.chunk(2)`` is realized by slicing the *weights* at trace time — the
    k and v paths never materialize (and then re-split) a 2C-channel tensor.
    """
    dim = x.shape[2]
    q = dwconv3x3(conv1x1(x, p[prefix + ".q.weight"]), p[prefix + ".q_dwconv.weight"])
    w_kv = p[prefix + ".kv.weight"]
    w_kvdw = p[prefix + ".kv_dwconv.weight"]
    k = dwconv3x3(conv1x1(y, w_kv[..., :dim]), w_kvdw[..., :dim])
    v = dwconv3x3(conv1x1(y, w_kv[..., dim:]), w_kvdw[..., dim:])
    return channel_attention(
        q, k, v, p[prefix + ".temperature"], heads,
        w_proj=p[prefix + ".project_out.weight"],
    )


@_scoped
def iel(p: Params, prefix: str, x: jnp.ndarray) -> jnp.ndarray:
    """Intensity Enhancement Layer — gated tanh FFN (net/LCA.py:45-67).

    The torch graph projects to 2*hidden channels, depthwise-convs, then
    ``chunk(2)``s.  Both halves are channel-independent through the 1x1 and
    the depthwise conv, so the weights are sliced at trace time and the two
    gate paths run without ever materializing the 2*hidden tensor.
    """
    w_pi = p[prefix + ".project_in.weight"]
    w_dw = p[prefix + ".dwconv.weight"]
    hidden = w_pi.shape[-1] // 2
    # Each gate branch is tanh(dw2(dw1(y))) + dw1(y): the fused Pallas
    # kernel (ops/iel_pallas.py) runs it in one HBM read+write at serving
    # shapes; its dispatcher falls back to the XLA twin elsewhere.
    x1 = iel_branch(
        conv1x1(x, w_pi[..., :hidden]), w_dw[..., :hidden], p[prefix + ".dwconv1.weight"]
    )
    x2 = iel_branch(
        conv1x1(x, w_pi[..., hidden:]), w_dw[..., hidden:], p[prefix + ".dwconv2.weight"]
    )
    return conv1x1(x1 * x2, p[prefix + ".project_out.weight"])


@_scoped
def hv_lca(p: Params, prefix: str, x: jnp.ndarray, y: jnp.ndarray, heads: int) -> jnp.ndarray:
    """``x + CAB(LN(x), LN(y))`` then IEL(LN(x)) — NOT residual on the IEL.

    Reference HV_LCA (net/LCA.py:71-81).
    """
    x = x + cab(p, prefix + ".ffn", layer_norm(p, prefix + ".norm", x), layer_norm(p, prefix + ".norm", y), heads)
    return iel(p, prefix + ".gdfn", layer_norm(p, prefix + ".norm", x))


@_scoped
def i_lca(p: Params, prefix: str, x: jnp.ndarray, y: jnp.ndarray, heads: int) -> jnp.ndarray:
    """Like hv_lca but with residual on the IEL (net/LCA.py:83-93)."""
    x = x + cab(p, prefix + ".ffn", layer_norm(p, prefix + ".norm", x), layer_norm(p, prefix + ".norm", y), heads)
    return x + iel(p, prefix + ".gdfn", layer_norm(p, prefix + ".norm", x))


@_scoped
def spatial_attention(p: Params, prefix: str, x: jnp.ndarray) -> jnp.ndarray:
    """avg+max channel pool -> 7x7 conv -> sigmoid gate.

    Reference SpatialAttention (net/CIDNet_MSSA.py:10-25).
    """
    avg_out = jnp.mean(x, axis=CH_AXIS, keepdims=True)
    max_out = jnp.max(x, axis=CH_AXIS, keepdims=True)
    y = jnp.concatenate([avg_out, max_out], axis=CH_AXIS)
    y = conv2d(y, p[prefix + ".conv1.weight"], padding="SAME")
    return x * jax.nn.sigmoid(y)
