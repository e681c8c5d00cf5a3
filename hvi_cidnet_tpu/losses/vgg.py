"""VGG feature extractor in JAX (perceptual loss backbone).

Re-implements the reference's ``loss/vgg_arch.py:87-239`` as a functional
NHWC graph.  Weights come from a local torchvision-format ``vgg19*.pth``
state_dict when available (the reference likewise prefers a local file,
vgg_arch.py:181-186); this environment has no network, so without a file the
extractor initializes from a fixed seed — fine for tests and for training
without perceptual loss.

Layer naming follows the reference's NAMES table (vgg_arch.py:88-110):
``conv{i}_{j}`` taps are the conv outputs *before* the ReLU.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

# (name, kind, out_channels) — vgg19 'features' spec (vgg_arch.py:104-109).
_VGG_SPECS: Dict[str, List[Tuple[str, str, int]]] = {}


def _build_spec(cfg: Sequence, version: str) -> None:
    spec = []
    block, conv_idx = 1, 1
    for item in cfg:
        if item == "M":
            spec.append((f"pool{block}", "pool", 0))
            block += 1
            conv_idx = 1
        else:
            spec.append((f"conv{block}_{conv_idx}", "conv", item))
            spec.append((f"relu{block}_{conv_idx}", "relu", 0))
            conv_idx += 1
    _VGG_SPECS[version] = spec


_build_spec([64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M", 512, 512, 512, 512, "M", 512, 512, 512, 512, "M"], "vgg19")
_build_spec([64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512, "M", 512, 512, 512, "M"], "vgg16")

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def init_vgg(key, vgg_type: str = "vgg19", up_to: str = "conv4_4") -> Dict[str, jnp.ndarray]:
    """Seeded He-init params up to (and including) layer ``up_to``."""
    spec = _VGG_SPECS[vgg_type]
    params: Dict[str, jnp.ndarray] = {}
    cin = 3
    for name, kind, cout in spec:
        if kind == "conv":
            key, k1, k2 = jax.random.split(key, 3)
            fan_in = cin * 9
            std = float(np.sqrt(2.0 / fan_in))
            params[name + ".weight"] = jax.random.normal(k1, (3, 3, cin, cout)) * std
            params[name + ".bias"] = jnp.zeros((cout,))
            cin = cout
        if name == up_to:
            break
    return params


def load_vgg_torch(path: str, vgg_type: str = "vgg19", up_to: str = "conv4_4") -> Dict[str, jnp.ndarray]:
    """Load torchvision ``features.N.{weight,bias}`` state_dict -> our names."""
    import torch

    state = torch.load(path, map_location="cpu", weights_only=True)
    spec = _VGG_SPECS[vgg_type]
    params: Dict[str, jnp.ndarray] = {}
    feat_idx = 0
    for name, kind, _ in spec:
        if kind == "conv":
            w = state[f"features.{feat_idx}.weight"].numpy().transpose(2, 3, 1, 0)
            b = state[f"features.{feat_idx}.bias"].numpy()
            params[name + ".weight"] = jnp.asarray(w)
            params[name + ".bias"] = jnp.asarray(b)
            feat_idx += 2  # conv + relu
        elif kind == "pool":
            feat_idx += 1
        if name == up_to:
            break
    return params


def _max_pool_2x2(x: jnp.ndarray, stride: int = 2) -> jnp.ndarray:
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, stride, stride, 1), "VALID"
    )


def vgg_features(
    params: Dict[str, jnp.ndarray],
    x: jnp.ndarray,
    layer_names: Sequence[str],
    *,
    vgg_type: str = "vgg19",
    use_input_norm: bool = True,
    range_norm: bool = True,
    pooling_stride: int = 2,
) -> Dict[str, jnp.ndarray]:
    """Run NHWC ``x`` through VGG, returning the requested taps.

    ``range_norm`` applies ``(x+1)/2`` *before* ImageNet normalization —
    the reference passes [0,1 ] images through this path anyway
    (vgg_arch.py:219-224 with train.py:192's range_norm=True default);
    replicated as-is for checkpoint-parity of trained models.
    """
    x = x.astype(jnp.float32)
    if range_norm:
        x = (x + 1.0) / 2.0
    if use_input_norm:
        x = (x - IMAGENET_MEAN) / IMAGENET_STD

    wanted = set(layer_names)
    last = max(_index_of(vgg_type, n) for n in wanted)
    out: Dict[str, jnp.ndarray] = {}
    for i, (name, kind, _) in enumerate(_VGG_SPECS[vgg_type]):
        if i > last:
            break
        if kind == "conv":
            w = params[name + ".weight"].astype(x.dtype)
            b = params[name + ".bias"].astype(x.dtype)
            x = jax.lax.conv_general_dilated(
                x, w, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32,
            ) + b
        elif kind == "relu":
            x = jax.nn.relu(x)
        else:
            x = _max_pool_2x2(x, pooling_stride)
        if name in wanted:
            out[name] = x
    return out


def _index_of(vgg_type: str, name: str) -> int:
    for i, (n, _, _) in enumerate(_VGG_SPECS[vgg_type]):
        if n == name:
            return i
    raise KeyError(name)
