"""VGG perceptual (+ optional Gram style) loss.

Re-implements ``loss/losses.py:68-161``.  The trainer instantiates it with
``{'conv1_2':1,'conv2_2':1,'conv3_4':1,'conv4_4':1}``, mse criterion,
``perceptual_weight=1`` and scales the result by ``opt.P_weight`` outside
(train.py:63-65,192).
"""

from __future__ import annotations

from typing import Dict, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp

from hvi_cidnet_tpu.losses.vgg import vgg_features


def _criterion(kind: str, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    if kind == "l1":
        return jnp.mean(jnp.abs(a - b))
    if kind == "mse":
        return jnp.mean((a - b) ** 2)
    if kind == "fro":
        return jnp.linalg.norm((a - b).reshape(-1))
    raise NotImplementedError(kind)


def _gram(feat: jnp.ndarray) -> jnp.ndarray:
    """Gram matrix over spatial positions (losses.py gram for style loss)."""
    n, h, w, c = feat.shape
    f = feat.reshape(n, h * w, c)
    return jnp.einsum("nxc,nxd->ncd", f, f, preferred_element_type=jnp.float32) / (c * h * w)


def perceptual_loss(
    vgg_params: Dict[str, jnp.ndarray],
    x: jnp.ndarray,
    gt: jnp.ndarray,
    layer_weights: Mapping[str, float],
    *,
    criterion: str = "mse",
    perceptual_weight: float = 1.0,
    style_weight: float = 0.0,
    use_input_norm: bool = True,
    range_norm: bool = True,
    vgg_type: str = "vgg19",
) -> Tuple[Optional[jnp.ndarray], Optional[jnp.ndarray]]:
    """Returns (percep, style); gt is gradient-detached (losses.py:133)."""
    names = list(layer_weights.keys())
    kw = dict(vgg_type=vgg_type, use_input_norm=use_input_norm, range_norm=range_norm)
    xf = vgg_features(vgg_params, x, names, **kw)
    gf = vgg_features(vgg_params, jax.lax.stop_gradient(gt), names, **kw)

    percep = None
    if perceptual_weight > 0:
        percep = sum(_criterion(criterion, xf[k], gf[k]) * layer_weights[k] for k in names)
        percep = percep * perceptual_weight

    style = None
    if style_weight > 0:
        style = sum(
            _criterion(criterion, _gram(xf[k]), _gram(gf[k])) * layer_weights[k]
            for k in names
        )
        style = style * style_weight
    return percep, style
