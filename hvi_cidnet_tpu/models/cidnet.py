"""CIDNet model family — base, MSSA, TNSM — as pure-function graphs.

Re-designs ``net/CIDNet.py``, ``net/CIDNet_MSSA.py``, ``net/CIDNet_TNSM.py``
as functional JAX programs over flat torch-named parameter dicts (see
``models/layers.py``).  The three deliberate graph quirks of the reference are
preserved because released checkpoints were trained with them:

(a) level-3 downsamples consume **pre-LCA** features (net/CIDNet.py:94-95);
(b) base variant: ``I_LCA5``'s output is discarded by ``ID_block2`` re-deriving
    from ``i_dec3`` (net/CIDNet.py:105,109) — the MSSA variant instead feeds
    the LCA5 output (net/CIDNet_MSSA.py:137,143);
(c) ``head1``/``ch1`` never feed an LCA (net/CIDNet.py:17-18).

Images are NHWC in [0,1].  The HVI transform and attention softmax run in
fp32; everything else follows ``compute_dtype`` (bf16 on TPU).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from hvi_cidnet_tpu.ops.hvi import rgb_to_hvi, hvi_to_rgb
from hvi_cidnet_tpu.ops import hvi_pallas as _hvi_pallas
from hvi_cidnet_tpu.ops import pallas_gate as _pallas_gate
from hvi_cidnet_tpu.ops.conv import (
    CH_AXIS,
    conv1x1,
    conv2d,
    conv3x3_replpad,
    dwconv3x3,
    internal_to_nhwc,
    nhwc_to_internal,
)
from hvi_cidnet_tpu.ops.resize import resize_bilinear_hwcb
from hvi_cidnet_tpu.models.layers import (
    Params,
    channel_attention,
    hv_lca,
    i_lca,
    layer_norm,
    norm_downsample,
    norm_upsample,
    spatial_attention,
)


@dataclasses.dataclass(frozen=True)
class CIDNetConfig:
    """Defaults mirror net/CIDNet.py:9-12."""

    channels: Tuple[int, int, int, int] = (36, 36, 72, 144)
    heads: Tuple[int, int, int, int] = (1, 2, 4, 8)
    norm: bool = False
    variant: str = "base"  # "base" | "mssa" | "tnsm"
    use_tnsm: bool = True  # only for variant="tnsm" (net/CIDNet_TNSM.py:19)


@dataclasses.dataclass(frozen=True)
class HVIGates:
    """Eval-time gates of the HVI inverse (net/HVI_transform.py:10-13)."""

    gated: bool = False
    gated2: bool = False
    alpha: float = 1.0
    alpha_s: float = 1.3


# ---------------------------------------------------------------------------
# Initialization (matches torch defaults so from-scratch training behaves the
# same; exact values obviously differ since the RNGs differ).
# ---------------------------------------------------------------------------


def _conv_init(key, kh, kw, cin_per_group, cout) -> jnp.ndarray:
    """torch Conv2d default: kaiming_uniform(a=sqrt(5)) == U(+-1/sqrt(fan_in))."""
    fan_in = cin_per_group * kh * kw
    bound = 1.0 / np.sqrt(fan_in)
    return jax.random.uniform(key, (kh, kw, cin_per_group, cout), jnp.float32, -bound, bound)


class _Init:
    """Tiny helper that fills a flat param dict with torch-named tensors."""

    def __init__(self, key):
        self.key = key
        self.p: Params = {}

    def _next(self):
        self.key, sub = jax.random.split(self.key)
        return sub

    def conv(self, name, kh, kw, cin_per_group, cout):
        self.p[name] = _conv_init(self._next(), kh, kw, cin_per_group, cout)

    def const(self, name, value):
        self.p[name] = jnp.asarray(value, jnp.float32)

    def ln(self, prefix, dim):
        self.const(prefix + ".weight", np.ones((dim,), np.float32))
        self.const(prefix + ".bias", np.zeros((dim,), np.float32))

    def prelu(self, name):
        self.const(name, np.full((1,), 0.25, np.float32))

    def down(self, prefix, cin, cout, use_norm):
        self.conv(prefix + ".down.0.weight", 3, 3, cin, cout)
        self.prelu(prefix + ".prelu.weight")
        if use_norm:
            self.ln(prefix + ".norm", cout)

    def up(self, prefix, cin, cout, use_norm):
        self.conv(prefix + ".up_scale.0.weight", 3, 3, cin, cout)
        self.conv(prefix + ".up.weight", 1, 1, cout * 2, cout)
        self.prelu(prefix + ".prelu.weight")
        if use_norm:
            self.ln(prefix + ".norm", cout)

    def cab(self, prefix, dim, heads):
        self.const(prefix + ".temperature", np.ones((heads, 1, 1), np.float32))
        self.conv(prefix + ".q.weight", 1, 1, dim, dim)
        self.conv(prefix + ".q_dwconv.weight", 3, 3, 1, dim)
        self.conv(prefix + ".kv.weight", 1, 1, dim, dim * 2)
        self.conv(prefix + ".kv_dwconv.weight", 3, 3, 1, dim * 2)
        self.conv(prefix + ".project_out.weight", 1, 1, dim, dim)

    def iel(self, prefix, dim, expansion=2.66):
        hidden = int(dim * expansion)
        self.conv(prefix + ".project_in.weight", 1, 1, dim, hidden * 2)
        self.conv(prefix + ".dwconv.weight", 3, 3, 1, hidden * 2)
        self.conv(prefix + ".dwconv1.weight", 3, 3, 1, hidden)
        self.conv(prefix + ".dwconv2.weight", 3, 3, 1, hidden)
        self.conv(prefix + ".project_out.weight", 1, 1, hidden, dim)

    def lca(self, prefix, dim, heads):
        self.iel(prefix + ".gdfn", dim)
        self.ln(prefix + ".norm", dim)
        self.cab(prefix + ".ffn", dim, heads)

    def tnsm(self, prefix, dim, heads, reduction=4):
        # DynamicNoiseMap (net/TNSM.py:7-57)
        red = max(8, dim // reduction)
        g = prefix + ".noise_map_generator"
        self.conv(g + ".fc1.weight", 1, 1, dim, red)
        self.conv(g + ".fc2.weight", 1, 1, red, dim)
        self.conv(g + ".noise_branch.0.weight", 3, 3, 1, dim)
        self.conv(g + ".noise_branch.2.weight", 1, 1, dim, dim)
        self.conv(g + ".final_conv.weight", 1, 1, dim, 1)
        # NoiseAwareAttentionCABStyle (net/TNSM.py:59-128)
        a = prefix + ".noise_attention"
        self.const(a + ".temperature", np.ones((heads, 1, 1), np.float32))
        self.conv(a + ".q.weight", 1, 1, dim, dim)
        self.conv(a + ".q_dwconv.weight", 3, 3, 1, dim)
        self.conv(a + ".kv.weight", 1, 1, dim, dim * 2)
        self.conv(a + ".kv_dwconv.weight", 3, 3, 1, dim * 2)
        self.conv(a + ".noise_scaler.0.weight", 1, 1, 1, dim)
        self.conv(a + ".project_out.weight", 1, 1, dim, dim)
        # AdaptiveFilter (net/TNSM.py:130-173)
        f = prefix + ".adaptive_filter"
        self.conv(f + ".noise_process.0.weight", 3, 3, 1, dim)
        self.conv(f + ".noise_process.2.weight", 1, 1, dim, dim)
        self.conv(f + ".detail_preserve.0.weight", 1, 1, dim, dim)
        self.conv(f + ".detail_preserve.2.weight", 3, 3, 1, dim)
        self.conv(f + ".fusion.weight", 1, 1, dim * 2, dim)
        self.ln(f + ".norm", dim)
        self.ln(prefix + ".norm1", dim)
        self.ln(prefix + ".norm2", dim)


def init_cidnet(key, config: CIDNetConfig = CIDNetConfig()) -> Params:
    """Create a fresh parameter dict for any CIDNet variant."""
    ch1, ch2, ch3, ch4 = config.channels
    _, h2, h3, h4 = config.heads
    ini = _Init(key)

    ini.conv("HVE_block0.1.weight", 3, 3, 3, ch1)
    ini.down("HVE_block1", ch1, ch2, config.norm)
    ini.down("HVE_block2", ch2, ch3, config.norm)
    ini.down("HVE_block3", ch3, ch4, config.norm)
    ini.up("HVD_block3", ch4, ch3, config.norm)
    ini.up("HVD_block2", ch3, ch2, config.norm)
    ini.up("HVD_block1", ch2, ch1, config.norm)
    ini.conv("HVD_block0.1.weight", 3, 3, ch1, 2)

    ini.conv("IE_block0.1.weight", 3, 3, 1, ch1)
    ini.down("IE_block1", ch1, ch2, config.norm)
    ini.down("IE_block2", ch2, ch3, config.norm)
    ini.down("IE_block3", ch3, ch4, config.norm)
    ini.up("ID_block3", ch4, ch3, config.norm)
    ini.up("ID_block2", ch3, ch2, config.norm)
    ini.up("ID_block1", ch2, ch1, config.norm)
    ini.conv("ID_block0.1.weight", 3, 3, ch1, 1)

    dims = {1: (ch2, h2), 2: (ch3, h3), 3: (ch4, h4), 4: (ch4, h4), 5: (ch3, h3), 6: (ch2, h2)}
    for idx, (dim, heads) in dims.items():
        ini.lca(f"HV_LCA{idx}", dim, heads)
        ini.lca(f"I_LCA{idx}", dim, heads)

    ini.const("trans.density_k", np.full((1,), 0.2, np.float32))

    if config.variant == "mssa":
        for name in ["sa_hv3", "sa_i3", "sa_hv2", "sa_i2", "sa_hv1", "sa_i1"]:
            ini.conv(f"{name}.conv1.weight", 7, 7, 2, 1)

    if config.variant == "tnsm" and config.use_tnsm:
        for idx, (dim, heads) in dims.items():
            for branch in ("HV_TNSM", "I_TNSM"):
                ini.tnsm(f"{branch}{idx}.tnsm", dim, heads)
        ini.conv("noise_fusion.0.weight", 3, 3, 12, 3)

    return ini.p


# ---------------------------------------------------------------------------
# TNSM blocks (forward only; params created above)
# ---------------------------------------------------------------------------


def _dynamic_noise_map(p: Params, g: str, x: jnp.ndarray) -> jnp.ndarray:
    """SE-style global pooling + local noise branch (net/TNSM.py:37-57)."""
    avg = jnp.mean(x, axis=(0, 1), keepdims=True)  # HWCB global spatial pool
    mx = jnp.max(x, axis=(0, 1), keepdims=True)

    def squeeze_excite(v):
        v = conv1x1(v, p[g + ".fc1.weight"])
        v = jax.nn.relu(v)
        return conv1x1(v, p[g + ".fc2.weight"])

    global_feat = jax.nn.sigmoid(squeeze_excite(avg) + squeeze_excite(mx))
    local = dwconv3x3(x, p[g + ".noise_branch.0.weight"])
    local = jax.nn.leaky_relu(local, 0.2)
    local = conv1x1(local, p[g + ".noise_branch.2.weight"])
    noise_feat = global_feat * local
    return jax.nn.sigmoid(conv1x1(noise_feat, p[g + ".final_conv.weight"]))


def _noise_aware_attention(p: Params, a: str, x, y, noise_map, heads: int) -> jnp.ndarray:
    """CAB-style attention, V modulated by noise map, q/k NOT normalized.

    Reference NoiseAwareAttentionCABStyle (net/TNSM.py:83-128).
    """
    q = dwconv3x3(conv1x1(x, p[a + ".q.weight"]), p[a + ".q_dwconv.weight"])
    kv = dwconv3x3(conv1x1(y, p[a + ".kv.weight"]), p[a + ".kv_dwconv.weight"])
    k, v = jnp.split(kv, 2, axis=CH_AXIS)
    if noise_map is not None:
        keep = jax.nn.sigmoid(conv1x1(noise_map, p[a + ".noise_scaler.0.weight"]))
        v = v * keep
    return channel_attention(
        q, k, v, p[a + ".temperature"], heads, normalize_qk=False,
        w_proj=p[a + ".project_out.weight"],
    )


def _adaptive_filter(p: Params, f: str, x, noise_map) -> jnp.ndarray:
    """Noise/detail dual-path fusion (net/TNSM.py:155-173)."""
    noise_b = conv1x1(jax.nn.leaky_relu(dwconv3x3(x, p[f + ".noise_process.0.weight"]), 0.2), p[f + ".noise_process.2.weight"])
    detail_b = dwconv3x3(jax.nn.leaky_relu(conv1x1(x, p[f + ".detail_preserve.0.weight"]), 0.2), p[f + ".detail_preserve.2.weight"])
    fused = jnp.concatenate([noise_map * noise_b, (1.0 - noise_map) * detail_b], axis=CH_AXIS)
    out = conv1x1(fused, p[f + ".fusion.weight"])
    return layer_norm(p, f + ".norm", out)


def _tnsm_block(p: Params, prefix: str, x, y, heads: int):
    """TrainableNoiseSuppression (net/TNSM.py:196-215). Returns (x, noise_map)."""
    noise_map = _dynamic_noise_map(p, prefix + ".noise_map_generator", x)
    x_n = layer_norm(p, prefix + ".norm1", x)
    y_n = layer_norm(p, prefix + ".norm1", y)
    x = x + _noise_aware_attention(p, prefix + ".noise_attention", x_n, y_n, noise_map, heads)
    x = x + _adaptive_filter(p, prefix + ".adaptive_filter", layer_norm(p, prefix + ".norm2", x), noise_map)
    return x, noise_map


# ---------------------------------------------------------------------------
# Forward passes
# ---------------------------------------------------------------------------


def hvit(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """``CIDNet.HVIT`` (net/CIDNet.py:124-126): RGB->HVI with learnable k."""
    return rgb_to_hvi(x, p["trans.density_k"])


def cidnet_forward(
    p: Params,
    x: jnp.ndarray,
    config: CIDNetConfig = CIDNetConfig(),
    gates: HVIGates = HVIGates(),
    *,
    compute_dtype=jnp.float32,
    training: bool = False,
    use_pallas: bool = True,
    input_layout: str = "nhwc",
):
    """Forward pass for any variant.  x: RGB in [0,1], H,W % 8 == 0.

    ``input_layout="nhwc"`` (default): x is (B,H,W,3) and the output is
    NHWC — the reference-compatible API.  ``input_layout="hwcb"``: x is
    (H,W,3,B) — the serving contract, where the host input pipeline packs
    batches directly into the model's internal layout (a free numpy
    transpose producer-side) so the device program contains NO boundary
    relayouts: the round-3 profile attributed ~40 ms/fwd at the bench
    shape to NHWC packing transposes alone.  Output is then HWCB too
    (and the TNSM noise map, when returned, stays HWCB).

    Returns RGB for base/mssa; ``(rgb, fused_noise|None)`` for tnsm
    (net/CIDNet_TNSM.py:248-294 returns noise only in training mode).

    ``use_pallas=False`` removes every Mosaic kernel from this trace —
    required when the program will be GSPMD-partitioned over a mesh
    (parallel/inference.py:spatial_enhance_fn; ops/pallas_gate.py).
    """
    if input_layout not in ("nhwc", "hwcb"):
        raise ValueError(f"input_layout must be 'nhwc' or 'hwcb', got {input_layout!r}")
    h, w = (x.shape[1], x.shape[2]) if input_layout == "nhwc" else (x.shape[0], x.shape[1])
    if h % 8 or w % 8:
        # Three bilinear x0.5 levels need x8-divisible extents; without this
        # check the failure is a cryptic concat-shape error mid-UNet.  Pad
        # like the reference does (reflect, crop after — data/eval_sets.py:23-29).
        raise ValueError(
            f"H and W must be multiples of 8 (got {h}x{w}); reflect-pad the "
            "input and crop the output, as cli/demo.py and the evaluator do"
        )
    with _pallas_gate.allow_pallas(use_pallas):
        return _forward_impl(
            p, x, config, gates, compute_dtype=compute_dtype, training=training,
            hwcb_io=input_layout == "hwcb",
        )


def _forward_impl(
    p: Params,
    x: jnp.ndarray,
    config: CIDNetConfig,
    gates: HVIGates,
    *,
    compute_dtype,
    training: bool,
    hwcb_io: bool = False,
):
    nrm = config.norm
    _, h2, h3, h4 = config.heads
    variant = config.variant
    use_tnsm = variant == "tnsm" and config.use_tnsm
    noise_maps = []

    k = p["trans.density_k"]
    with jax.named_scope("HVIT"):
        if hwcb_io and _hvi_pallas.should_use_pallas():
            # x already (H,W,3,B): the fused kernel consumes and emits the
            # internal layout with zero lane-crossing transposes
            hvi = _hvi_pallas.rgb_to_hvi_pallas_hwcb_io(x, k).astype(compute_dtype)
        elif hwcb_io:
            # XLA transform in the internal layout with batch in lanes
            hvi = rgb_to_hvi(x, k, channel_axis=2).astype(compute_dtype)
        elif _hvi_pallas.should_use_pallas():
            # fused kernel emits the HWCB internal layout directly (skips the
            # (N,3)-lane packing transpose AND the NHWC boundary transpose)
            hvi = _hvi_pallas.rgb_to_hvi_pallas_hwcb(x, k).astype(compute_dtype)
        else:
            hvi_nhwc = rgb_to_hvi(x, k).astype(compute_dtype)  # CIDNet.py:73
            # switch to the HWCB internal layout (one cheap 3-channel transpose)
            hvi = nhwc_to_internal(hvi_nhwc)
    i_img = hvi[:, :, 2:3, :]                      # :74 (C is axis 2 in HWCB)

    with jax.named_scope("IE_block0"):
        i_enc0 = conv3x3_replpad(i_img, p["IE_block0.1.weight"])  # :76
    i_enc1 = norm_downsample(p, "IE_block1", i_enc0, use_norm=nrm)
    with jax.named_scope("HVE_block0"):
        hv_0 = conv3x3_replpad(hvi, p["HVE_block0.1.weight"])
    hv_1 = norm_downsample(p, "HVE_block1", hv_0, use_norm=nrm)
    i_jump0, hv_jump0 = i_enc0, hv_0

    i_enc2 = i_lca(p, "I_LCA1", i_enc1, hv_1, h2)  # :83
    hv_2 = hv_lca(p, "HV_LCA1", hv_1, i_enc1, h2)
    if use_tnsm:  # CIDNet_TNSM.py:122-132
        i_enc2_t, i_n1 = _tnsm_block(p, "I_TNSM1.tnsm", i_enc2, hv_2, h2)
        hv_2_t, hv_n1 = _tnsm_block(p, "HV_TNSM1.tnsm", hv_2, i_enc2, h2)
        i_enc2, hv_2 = i_enc2_t, hv_2_t
        noise_maps += [i_n1, hv_n1]
    v_jump1, hv_jump1 = i_enc2, hv_2
    i_enc2 = norm_downsample(p, "IE_block2", i_enc2, use_norm=nrm)
    hv_2 = norm_downsample(p, "HVE_block2", hv_2, use_norm=nrm)

    i_enc3 = i_lca(p, "I_LCA2", i_enc2, hv_2, h3)  # :90
    hv_3 = hv_lca(p, "HV_LCA2", hv_2, i_enc2, h3)
    if use_tnsm:
        i_enc3_t, i_n2 = _tnsm_block(p, "I_TNSM2.tnsm", i_enc3, hv_3, h3)
        hv_3_t, hv_n2 = _tnsm_block(p, "HV_TNSM2.tnsm", hv_3, i_enc3, h3)
        i_enc3, hv_3 = i_enc3_t, hv_3_t
        noise_maps += [i_n2, hv_n2]
    v_jump2, hv_jump2 = i_enc3, hv_3
    # quirk (a): level-3 downsamples consume the PRE-LCA features (:94-95)
    i_enc3 = norm_downsample(p, "IE_block3", i_enc2, use_norm=nrm)
    hv_3 = norm_downsample(p, "HVE_block3", hv_2, use_norm=nrm)

    i_enc4 = i_lca(p, "I_LCA3", i_enc3, hv_3, h4)  # :97
    hv_4 = hv_lca(p, "HV_LCA3", hv_3, i_enc3, h4)
    if use_tnsm:
        i_enc4_t, i_n3 = _tnsm_block(p, "I_TNSM3.tnsm", i_enc4, hv_4, h4)
        hv_4_t, hv_n3 = _tnsm_block(p, "HV_TNSM3.tnsm", hv_4, i_enc4, h4)
        i_enc4, hv_4 = i_enc4_t, hv_4_t
        noise_maps += [i_n3, hv_n3]

    i_dec4 = i_lca(p, "I_LCA4", i_enc4, hv_4, h4)  # :100
    hv_4 = hv_lca(p, "HV_LCA4", hv_4, i_enc4, h4)
    if use_tnsm:
        i_dec4_t, i_n4 = _tnsm_block(p, "I_TNSM4.tnsm", i_dec4, hv_4, h4)
        hv_4_t, hv_n4 = _tnsm_block(p, "HV_TNSM4.tnsm", hv_4, i_dec4, h4)
        i_dec4, hv_4 = i_dec4_t, hv_4_t
        noise_maps += [i_n4, hv_n4]

    hv_3 = norm_upsample(p, "HVD_block3", hv_4, hv_jump2, use_norm=nrm)  # :103
    if variant == "mssa":
        hv_3 = spatial_attention(p, "sa_hv3", hv_3)  # CIDNet_MSSA.py:133
    i_dec3 = norm_upsample(p, "ID_block3", i_dec4, v_jump2, use_norm=nrm)
    if variant == "mssa":
        i_dec3 = spatial_attention(p, "sa_i3", i_dec3)  # CIDNet_MSSA.py:135

    i_dec2 = i_lca(p, "I_LCA5", i_dec3, hv_3, h3)  # :105
    hv_2 = hv_lca(p, "HV_LCA5", hv_3, i_dec3, h3)
    if use_tnsm:
        i_dec2_t, i_n5 = _tnsm_block(p, "I_TNSM5.tnsm", i_dec2, hv_2, h3)
        hv_2_t, hv_n5 = _tnsm_block(p, "HV_TNSM5.tnsm", hv_2, i_dec2, h3)
        i_dec2, hv_2 = i_dec2_t, hv_2_t
        noise_maps += [i_n5, hv_n5]

    hv_2 = norm_upsample(p, "HVD_block2", hv_2, hv_jump1, use_norm=nrm)  # :108
    if variant == "mssa":
        hv_2 = spatial_attention(p, "sa_hv2", hv_2)
    if variant == "mssa":
        # MSSA feeds the LCA5 output (CIDNet_MSSA.py:143)
        i_dec2 = norm_upsample(p, "ID_block2", i_dec2, v_jump1, use_norm=nrm)
        i_dec2 = spatial_attention(p, "sa_i2", i_dec2)
    else:
        # quirk (b): base + tnsm discard I_LCA5's output (:109, CIDNet_TNSM.py:218)
        i_dec2 = norm_upsample(p, "ID_block2", i_dec3, v_jump1, use_norm=nrm)

    i_dec1 = i_lca(p, "I_LCA6", i_dec2, hv_2, h2)  # :111
    hv_1 = hv_lca(p, "HV_LCA6", hv_2, i_dec2, h2)
    if use_tnsm:
        i_dec1_t, i_n6 = _tnsm_block(p, "I_TNSM6.tnsm", i_dec1, hv_1, h2)
        hv_1_t, hv_n6 = _tnsm_block(p, "HV_TNSM6.tnsm", hv_1, i_dec1, h2)
        i_dec1, hv_1 = i_dec1_t, hv_1_t
        noise_maps += [i_n6, hv_n6]

    i_dec1 = norm_upsample(p, "ID_block1", i_dec1, i_jump0, use_norm=nrm)  # :114
    if variant == "mssa":
        i_dec1 = spatial_attention(p, "sa_i1", i_dec1)
    with jax.named_scope("ID_block0"):
        i_dec0 = conv3x3_replpad(i_dec1, p["ID_block0.1.weight"])
    hv_1 = norm_upsample(p, "HVD_block1", hv_1, hv_jump0, use_norm=nrm)
    if variant == "mssa":
        hv_1 = spatial_attention(p, "sa_hv1", hv_1)
    with jax.named_scope("HVD_block0"):
        hv_0 = conv3x3_replpad(hv_1, p["HVD_block0.1.weight"])

    with jax.named_scope("hvi_residual"):
        output_hvi_hwcb = jnp.concatenate([hv_0, i_dec0], axis=CH_AXIS) + hvi  # :119
    # PHVIT consumed the detached scalar this_k (HVI_transform.py:38,59):
    with jax.named_scope("PHVIT"):
        if hwcb_io and _hvi_pallas.should_use_pallas():
            # HWCB in AND out: the fused kernel runs with zero lane-crossing
            # transposes (HWB plane order; B never leaves the lane dim)
            output_rgb = _hvi_pallas.hvi_to_rgb_pallas_hwcb_io(
                output_hvi_hwcb, jax.lax.stop_gradient(k),
                gated=gates.gated, gated2=gates.gated2,
                alpha=gates.alpha, alpha_s=gates.alpha_s,
            )
        elif hwcb_io:
            output_rgb = hvi_to_rgb(
                output_hvi_hwcb,
                jax.lax.stop_gradient(k),
                gated=gates.gated,
                gated2=gates.gated2,
                alpha=gates.alpha,
                alpha_s=gates.alpha_s,
                channel_axis=2,
            )
        elif _hvi_pallas.should_use_pallas():
            # consumes HWCB directly (no boundary transpose), emits NHWC
            output_rgb = _hvi_pallas.hvi_to_rgb_pallas_hwcb(
                output_hvi_hwcb, jax.lax.stop_gradient(k),
                gated=gates.gated, gated2=gates.gated2,
                alpha=gates.alpha, alpha_s=gates.alpha_s,
            )
        else:
            output_rgb = hvi_to_rgb(
                internal_to_nhwc(output_hvi_hwcb),
                jax.lax.stop_gradient(k),
                gated=gates.gated,
                gated2=gates.gated2,
                alpha=gates.alpha,
                alpha_s=gates.alpha_s,
            )

    if variant == "tnsm":
        if use_tnsm and training:
            # Resize the 12 per-level maps to output res, fuse 12->3 + sigmoid
            # (CIDNet_TNSM.py:248-267; align_corners=False interpolation :258).
            th, tw = (
                (output_rgb.shape[0], output_rgb.shape[1])
                if hwcb_io
                else (output_rgb.shape[1], output_rgb.shape[2])
            )
            resized = [resize_bilinear_hwcb(nm, th, tw, align_corners=False) for nm in noise_maps]
            stacked = jnp.concatenate(resized, axis=CH_AXIS)
            fused = jax.nn.sigmoid(conv2d(stacked, p["noise_fusion.0.weight"], padding="SAME"))
            return output_rgb, (fused if hwcb_io else internal_to_nhwc(fused))
        return output_rgb, None
    return output_rgb


def count_params(p: Params) -> int:
    return int(sum(np.prod(v.shape) for v in p.values()))
