"""LPIPS (AlexNet flavor) in JAX.

The reference scores LPIPS through the ``lpips`` pip package on GPU
(measure.py:78-79,145-149).  This is a from-scratch JAX implementation of the
same metric: AlexNet feature stack, per-layer unit-normalized feature diffs,
learned 1x1 "lin" weights, spatial average, layer sum.

Pretrained AlexNet + lin weights cannot be downloaded here (zero egress);
``load_lpips_torch`` consumes a user-supplied combined state_dict (the lpips
package's ``.pth`` merged with torchvision alexnet features), and
``init_lpips`` gives a seeded stand-in so the pipeline runs end-to-end.
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np
import jax
import jax.numpy as jnp

# AlexNet 'features' spec: (name, kind, params) — torchvision layout.
# conv: (out, kernel, stride, pad); taps are post-ReLU (lpips slices 1..5).
_ALEX = [
    ("conv1", "conv", (64, 11, 4, 2)),
    ("relu1", "relu", None),
    ("pool1", "pool", None),
    ("conv2", "conv", (192, 5, 1, 2)),
    ("relu2", "relu", None),
    ("pool2", "pool", None),
    ("conv3", "conv", (384, 3, 1, 1)),
    ("relu3", "relu", None),
    ("conv4", "conv", (256, 3, 1, 1)),
    ("relu4", "relu", None),
    ("conv5", "conv", (256, 3, 1, 1)),
    ("relu5", "relu", None),
]
_TAPS = ["relu1", "relu2", "relu3", "relu4", "relu5"]
_TAP_CH = [64, 192, 384, 256, 256]

# lpips input scaling layer constants (ScalingLayer shift/scale).
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def init_lpips(key) -> Dict[str, jnp.ndarray]:
    """Seeded stand-in weights (architecture-faithful, scores not calibrated)."""
    params: Dict[str, jnp.ndarray] = {}
    cin = 3
    for name, kind, spec in _ALEX:
        if kind == "conv":
            cout, k, _, _ = spec
            key, k1 = jax.random.split(key)
            std = float(np.sqrt(2.0 / (cin * k * k)))
            params[name + ".weight"] = jax.random.normal(k1, (k, k, cin, cout)) * std
            params[name + ".bias"] = jnp.zeros((cout,))
            cin = cout
    for i, ch in enumerate(_TAP_CH):
        key, k1 = jax.random.split(key)
        params[f"lin{i}.weight"] = jnp.abs(jax.random.normal(k1, (1, 1, ch, 1))) * 0.1
    return params


def load_lpips_torch(path: str) -> Dict[str, jnp.ndarray]:
    """Load a combined torch state_dict with alexnet ``features.N.*`` keys and
    lpips ``lin{i}.model.1.weight`` keys (or bare ``lin{i}.weight``)."""
    import torch

    state = torch.load(path, map_location="cpu", weights_only=True)
    params: Dict[str, jnp.ndarray] = {}
    feat_idx = 0
    for name, kind, _ in _ALEX:
        if kind == "conv":
            w = state[f"features.{feat_idx}.weight"].numpy().transpose(2, 3, 1, 0)
            b = state[f"features.{feat_idx}.bias"].numpy()
            params[name + ".weight"] = jnp.asarray(w)
            params[name + ".bias"] = jnp.asarray(b)
        if kind in ("conv", "relu", "pool"):
            feat_idx += 1
    for i in range(5):
        for cand in (f"lin{i}.model.1.weight", f"lin{i}.weight"):
            if cand in state:
                w = state[cand].numpy().transpose(2, 3, 1, 0)
                params[f"lin{i}.weight"] = jnp.asarray(w)
                break
        else:
            raise KeyError(f"lin{i} weight not found in {path}")
    return params


def _alex_features(params, x: jnp.ndarray) -> List[jnp.ndarray]:
    feats = []
    for name, kind, spec in _ALEX:
        if kind == "conv":
            _, k, stride, pad = spec
            x = jax.lax.conv_general_dilated(
                x,
                params[name + ".weight"].astype(x.dtype),
                (stride, stride),
                [(pad, pad), (pad, pad)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + params[name + ".bias"].astype(x.dtype)
        elif kind == "relu":
            x = jax.nn.relu(x)
            if name in _TAPS:
                feats.append(x)
        else:  # maxpool 3x3 stride 2
            x = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1), "VALID"
            )
    return feats


def lpips_distance(params: Dict[str, jnp.ndarray], img1: jnp.ndarray, img2: jnp.ndarray) -> jnp.ndarray:
    """LPIPS between NHWC images in [-1, 1] (lpips package convention)."""

    def prep(x):
        return (x.astype(jnp.float32) - _SHIFT) / _SCALE

    f1 = _alex_features(params, prep(img1))
    f2 = _alex_features(params, prep(img2))
    total = 0.0
    for i, (a, b) in enumerate(zip(f1, f2)):
        # unit-normalize over channels (lpips normalize_tensor, eps 1e-10)
        a = a / jnp.sqrt(jnp.sum(a * a, axis=-1, keepdims=True) + 1e-10)
        b = b / jnp.sqrt(jnp.sum(b * b, axis=-1, keepdims=True) + 1e-10)
        d = (a - b) ** 2
        w = params[f"lin{i}.weight"]
        proj = jax.lax.conv_general_dilated(
            d, w.astype(d.dtype), (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        total = total + jnp.mean(proj, axis=(1, 2, 3))
    return total


def im2tensor_range(img_uint8: np.ndarray) -> np.ndarray:
    """[0,255] HWC -> [-1,1] NHWC float (lpips.im2tensor semantics)."""
    return (img_uint8.astype(np.float32) / 127.5 - 1.0)[None]
