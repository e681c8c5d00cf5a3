"""Torch checkpoint (.pth / safetensors) <-> JAX param-tree conversion.

The reference publishes weights as torch ``state_dict`` pickles
(``eval.py:42``) and HF safetensors (``eval_hf.py:31-35``).  Our param trees
use the *same names* with TPU layouts, so conversion is a per-tensor layout
transform:

* 4-D conv weights: OIHW -> HWIO transpose;
* everything else (LayerNorm w/b, PReLU, temperature, density_k): unchanged.

Also provides the reverse transform so checkpoints trained here can be
consumed by the reference implementation.
"""

from __future__ import annotations

from typing import Dict, Mapping, Optional

import numpy as np
import jax.numpy as jnp


def _is_conv_weight(name: str, arr) -> bool:
    return name.endswith(".weight") and getattr(arr, "ndim", 0) == 4


def from_torch_state_dict(state: Mapping[str, "object"]) -> Dict[str, jnp.ndarray]:
    """Convert a torch state_dict (tensors or ndarrays) to a JAX param dict."""
    out: Dict[str, jnp.ndarray] = {}
    for name, value in state.items():
        if hasattr(value, "detach"):  # torch.Tensor without importing torch
            value = value.detach().cpu().numpy()
        value = np.asarray(value, dtype=np.float32)
        if _is_conv_weight(name, value):
            value = value.transpose(2, 3, 1, 0)  # OIHW -> HWIO
        out[name] = jnp.asarray(value)
    return out


def to_torch_state_dict(params: Mapping[str, jnp.ndarray]) -> Dict[str, np.ndarray]:
    """Inverse of :func:`from_torch_state_dict` (returns numpy arrays)."""
    out: Dict[str, np.ndarray] = {}
    for name, value in params.items():
        arr = np.asarray(value, dtype=np.float32)
        if _is_conv_weight(name, arr):
            arr = arr.transpose(3, 2, 0, 1)  # HWIO -> OIHW
        out[name] = arr
    return out


def load_pth(path: str) -> Dict[str, jnp.ndarray]:
    """Load a ``.pth`` state_dict via torch-cpu (reference eval.py:42)."""
    import torch

    state = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(state, dict) and "state_dict" in state:
        state = state["state_dict"]
    return from_torch_state_dict(state)


def load_safetensors(path: str) -> Dict[str, jnp.ndarray]:
    """Load HF safetensors weights (reference eval_hf.py:27-35)."""
    from safetensors.numpy import load_file

    return from_torch_state_dict(load_file(path))


def load_weights(path: str) -> Dict[str, jnp.ndarray]:
    if path.endswith(".safetensors"):
        return load_safetensors(path)
    return load_pth(path)


def filtered_update(
    params: Dict[str, jnp.ndarray],
    loaded: Mapping[str, jnp.ndarray],
    *,
    strict: bool = True,
) -> Dict[str, jnp.ndarray]:
    """Merge loaded weights into ``params``.

    ``strict=True`` mirrors ``load_state_dict(strict=True)`` (eval.py:42);
    ``strict=False`` mirrors the TNSM evaluator's shape-filtered non-strict
    load (eval_tnsm.py:39-43): keep only keys present with matching shapes.
    """
    if strict:
        missing = set(params) - set(loaded)
        unexpected = set(loaded) - set(params)
        if missing or unexpected:
            raise KeyError(
                f"strict load failed: missing={sorted(missing)[:5]}... "
                f"unexpected={sorted(unexpected)[:5]}..."
            )
        return {k: jnp.asarray(loaded[k]) for k in params}
    merged = dict(params)
    for k, v in loaded.items():
        if k in merged and tuple(merged[k].shape) == tuple(v.shape):
            merged[k] = jnp.asarray(v)
    return merged
