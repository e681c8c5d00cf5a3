"""Convolution and norm primitives in the framework's HWCB internal layout.

Activations inside the model are **HWCB** — (height, width, channels, batch).
Row-major HWCB is exactly XLA-TPU's *preferred* convolution layout at the
serving batch (an optimized-HLO dump of the round-1 NHCW graph showed every
conv fusion laid out {0,2,3,1} — lanes=batch, sublanes=channels — with
41.5 GB/forward of layout-conversion copies bridging back to the NHCW
default).  Keeping the logical order equal to the physical preference makes
those copies vanish: the LCA interiors measured 1.8x faster in HWCB
(experiments/hwcb_r2.py, G7/G8) with bit-identical results.  The public
model API stays NHWC; ``models/cidnet.py`` transposes the 3-channel image
once at each boundary.

Weights are stored HWIO (kh, kw, in/groups, out) exactly as for NHWC — only
``dimension_numbers`` changes — so the torch-checkpoint converter is
layout-independent.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp

# (height, width, channels, batch) activations, HWIO weights.
_DN = ("HWCN", "HWIO", "HWCN")

H_AXIS = 0
W_AXIS = 1
CH_AXIS = 2  # channel axis of the internal activation layout
B_AXIS = 3
SPATIAL_AXES = (0, 1)


def nhwc_to_internal(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.transpose(x, (1, 2, 3, 0))


def internal_to_nhwc(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.transpose(x, (3, 0, 1, 2))


def conv2d(
    x: jnp.ndarray,
    w: jnp.ndarray,
    *,
    stride: int = 1,
    padding="SAME",
    groups: int = 1,
) -> jnp.ndarray:
    """2-D convolution on HWCB ``x``. ``padding``: 'SAME'/'VALID'/explicit.

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
    return jnp.pad(x, ((pad, pad), (pad, pad), (0, 0), (0, 0)), mode="edge")


def conv3x3_replpad(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """ReplicationPad2d(1) + Conv2d(k=3, padding=0) stem/head blocks.

    Reference: the ``nn.Sequential`` stems HVE_block0/IE_block0 and heads
    HVD_block0/ID_block0 (net/CIDNet.py:21-24,32-35,39-42,50-53).

    Implemented as a zero-SAME conv plus exact border corrections on
    1-pixel strips: materializing the replication-padded activation costs
    a full read+write of the (H+2, W+2) tensor (~10 ms per 36-channel L0
    head at the bench shape), while the strips are ~1/H of that.  The
    correction adds the taps SAME zeroed out, with replication clamping:
    rows via the kernel's dy=+-1 rows on edge-padded 1-row strips, cols
    via dx=+-1 columns on edge-padded 1-col strips, minus the corner taps
    both corrections double-count.
    """
    out = conv2d(x, w, padding="SAME")
    h_, w_ = x.shape[0], x.shape[1]

    def strip_conv(strip, kern):
        """VALID conv of an edge-padded strip with a 1x3 / 3x1 kernel row."""
        pad_h = (1, 1) if kern.shape[0] == 3 else (0, 0)
        pad_w = (1, 1) if kern.shape[1] == 3 else (0, 0)
        padded = jnp.pad(strip, (pad_h, pad_w, (0, 0), (0, 0)), mode="edge")
        return conv2d(padded, kern, padding="VALID")

    top = strip_conv(x[0:1], w[0:1])          # dy=-1 taps, clamped to row 0
    bot = strip_conv(x[h_ - 1:h_], w[2:3])    # dy=+1 taps
    left = strip_conv(x[:, 0:1], w[:, 0:1])   # dx=-1 taps
    right = strip_conv(x[:, w_ - 1:w_], w[:, 2:3])

    out = out.at[0:1].add(top).at[h_ - 1:h_].add(bot)
    out = out.at[:, 0:1].add(left).at[:, w_ - 1:w_].add(right)

    # corners: the (dy, dx) = (+-1, +-1) tap appears in both a row and a
    # col correction — subtract it once
    for (r, c, ky, kx) in ((0, 0, 0, 0), (0, w_ - 1, 0, 2),
                           (h_ - 1, 0, 2, 0), (h_ - 1, w_ - 1, 2, 2)):
        corner = jnp.einsum("co,cb->ob", w[ky, kx].astype(x.dtype), x[r, c])
        out = out.at[r, c].add(-corner)
    return out


def conv3x3_same(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Dense 3x3 stride-1 zero-SAME conv (NormDown/Up 3x3s)."""
    return conv2d(x, w, padding="SAME")


def prelu(x: jnp.ndarray, a: jnp.ndarray) -> jnp.ndarray:
    """PReLU with a single shared slope (torch ``nn.PReLU()`` default)."""
    a = jnp.asarray(a).reshape(()).astype(x.dtype)
    return jnp.maximum(x, 0) + a * jnp.minimum(x, 0)


def _ln_stats_conv() -> bool:
    """Opt-in (``LN_STATS_CONV=1`` / ``kernel_flags(ln_stats_conv=True)``):
    bf16 LN statistics via C->1 ones-convs on the MXU instead of the VPU
    reduce fusions.  Pending a same-window TPU A/B
    (experiments/ln_stats_mxu_r3.py); parity is CI-tested either way."""
    from hvi_cidnet_tpu.ops.pallas_gate import kernel_flag

    return kernel_flag("ln_stats_conv")


@jax.custom_vjp
def _channel_moments_conv(x: jnp.ndarray):
    """fp32 channel moments (mean, mean-of-squares) via C->1 ones-convs.

    The mean conv keeps the bf16 operand (fp32 accumulation via
    ``preferred_element_type``) — the arm the A/B measures.  AD cannot
    differentiate that conv (its lhs-transpose rule would build a
    mixed-dtype f32xbf16 conv, which jax rejects), so the backward is the
    analytic gradient of the moments instead: d(u)/dx = g_u/n broadcast,
    d(m2)/dx = 2x*g_m2/n.
    """
    n = x.shape[CH_AXIS]
    k = jnp.ones((1, 1, n, 1), x.dtype)  # exact in bf16; divide in fp32 below
    u = jax.lax.conv_general_dilated(
        x, k, (1, 1), "VALID", dimension_numbers=_DN,
        preferred_element_type=jnp.float32) / n
    m2 = jax.lax.conv_general_dilated(
        jnp.square(x.astype(jnp.float32)), k.astype(jnp.float32),
        (1, 1), "VALID", dimension_numbers=_DN) / n
    return u, m2


def _channel_moments_conv_fwd(x):
    return _channel_moments_conv(x), x


def _channel_moments_conv_bwd(x, g):
    gu, gm2 = g
    n = x.shape[CH_AXIS]
    gx = gu / n + gm2 * (2.0 / n) * x.astype(jnp.float32)
    return (gx.astype(x.dtype),)


_channel_moments_conv.defvjp(_channel_moments_conv_fwd, _channel_moments_conv_bwd)


def layer_norm_channels(x: jnp.ndarray, weight: jnp.ndarray, bias: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """Channel LayerNorm over the HWCB channel axis.

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
    if _ln_stats_conv():
        # Stats on the conv emitter (round 3): the profile's LN pool is two
        # VPU cross-sublane reduce fusions sustaining ~40 GB/s, while 1x1
        # convs over the same tensors run near the HBM roofline.  A C->1
        # ones/n kernel computes the identical fp32-accumulated channel
        # moments on the MXU (experiments/ln_stats_mxu_r3.py measures the
        # arms; numerics equal to the reduce path up to summation order).
        u, m2 = _channel_moments_conv(x)
    else:
        u = jnp.sum(x, axis=CH_AXIS, keepdims=True, dtype=jnp.float32) / n
        m2 = jnp.sum(jnp.square(x.astype(jnp.float32)), axis=CH_AXIS, keepdims=True) / n
    s = jnp.maximum(m2 - u * u, 0.0)
    scale = jax.lax.rsqrt(s + eps).astype(dt)
    shift = u.astype(dt)
    return w.astype(dt) * ((x - shift) * scale) + b.astype(dt)
