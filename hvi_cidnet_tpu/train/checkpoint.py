"""Checkpoint save/load/resume.

The reference snapshots ``model.state_dict()`` to ``weights/train/epoch_N.pth``
every ``snapshots`` epochs, without optimizer/RNG state (train.py:93-101,
SURVEY.md §5.4).  Here the native format is a flat ``.npz`` that carries
params *and* optimizer state *and* epoch (true resume), plus converters to
and from the reference's ``.pth``/safetensors for weight interchange.
"""

from __future__ import annotations

import os
import re
from typing import Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from hvi_cidnet_tpu.compat.torch_ckpt import load_weights, to_torch_state_dict

_PARAM = "param::"
_OPT = "opt::"
_META = "meta::"


def save_checkpoint(path: str, params: Dict[str, jnp.ndarray], opt_state=None, epoch: int = 0) -> str:
    """Write a native .npz checkpoint (atomic rename)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    payload = {_PARAM + k: np.asarray(v) for k, v in params.items()}
    if opt_state is not None:
        flat, _ = jax.tree_util.tree_flatten(opt_state)
        for i, leaf in enumerate(flat):
            payload[f"{_OPT}{i}"] = np.asarray(leaf)
    payload[_META + "epoch"] = np.asarray(epoch)
    tmp = path + ".tmp.npz"
    np.savez(tmp, **payload)
    os.replace(tmp, path)
    return path


def load_checkpoint(path: str, opt_state_template=None) -> Tuple[Dict[str, jnp.ndarray], Optional[object], int]:
    """Load a native .npz checkpoint -> (params, opt_state|None, epoch)."""
    data = np.load(path)
    params = {k[len(_PARAM):]: jnp.asarray(data[k]) for k in data.files if k.startswith(_PARAM)}
    epoch = int(data[_META + "epoch"]) if _META + "epoch" in data.files else 0
    opt_state = None
    if opt_state_template is not None:
        flat_t, treedef = jax.tree_util.tree_flatten(opt_state_template)
        flat = []
        for i, leaf in enumerate(flat_t):
            key = f"{_OPT}{i}"
            flat.append(jnp.asarray(data[key]) if key in data.files else leaf)
        opt_state = jax.tree_util.tree_unflatten(treedef, flat)
    return params, opt_state, epoch


def load_any(path: str) -> Dict[str, jnp.ndarray]:
    """Load model weights from any supported container.

    Files: native ``.npz``, torch ``.pth``, safetensors.  Directories: an
    HF-layout export (``model.safetensors`` inside, save_pretrained's
    output) or an orbax checkpoint tree (digit step dirs; loads the newest
    step's params) — so ``--ckpt_backend orbax`` training output feeds the
    eval/demo CLIs without a conversion step.
    """
    if os.path.isdir(path):
        hf_file = os.path.join(path, "model.safetensors")
        if os.path.isfile(hf_file):
            return load_weights(hf_file)
        if any(re.fullmatch(r"\d+", d) for d in os.listdir(path)):
            from hvi_cidnet_tpu.train.orbax_ckpt import OrbaxCheckpoints

            with OrbaxCheckpoints(path) as ck:
                params, _, _ = ck.restore(None)
            return {k: jnp.asarray(v) for k, v in params.items()}
        raise FileNotFoundError(
            f"{path}: directory is neither an HF export (model.safetensors) "
            "nor an orbax checkpoint tree (digit step dirs)"
        )
    if path.endswith(".npz"):
        return load_checkpoint(path)[0]
    return load_weights(path)


def export_pth(path: str, params: Dict[str, jnp.ndarray]) -> str:
    """Write a torch-loadable state_dict so reference tooling can consume
    checkpoints trained here (inverse of eval.py:42's load)."""
    import torch

    state = {k: torch.from_numpy(np.ascontiguousarray(v).copy()) for k, v in to_torch_state_dict(params).items()}
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    torch.save(state, path)
    return path


def save_pretrained(directory: str, params: Dict[str, jnp.ndarray], config=None) -> str:
    """HF-layout export: ``model.safetensors`` + ``config.json``.

    The reference gets this surface from ``PyTorchModelHubMixin``
    (net/CIDNet.py:6-8) — ``save_pretrained`` writes the state dict as
    safetensors next to a ``config.json`` holding the constructor kwargs.
    This is the exact inverse of our hub-load path (``cli/eval_hf.py`` +
    ``utils/hf_config.config_from_hf_json``): tensors go out in torch
    names/layouts so either stack can re-load the folder.
    """
    import json

    from safetensors.numpy import save_file

    os.makedirs(directory, exist_ok=True)
    # to_torch_state_dict returns transposed views; safetensors serializes
    # the raw buffer, so contiguity is part of correctness here.
    state = {k: np.ascontiguousarray(v) for k, v in to_torch_state_dict(params).items()}
    save_file(state, os.path.join(directory, "model.safetensors"))
    cfg = {}
    if config is not None:
        cfg = {
            "channels": list(config.channels),
            "heads": list(config.heads),
            "norm": bool(config.norm),
        }
        # the reference mixin only ever serializes the base model's kwargs;
        # mssa/tnsm folders carry extra tensors that a variant-less reload
        # would silently shape-filter away, so record the variant explicitly
        # (config_from_hf_json defaults to "base" when the key is absent)
        if config.variant != "base":
            cfg["variant"] = config.variant
    with open(os.path.join(directory, "config.json"), "w") as f:
        json.dump(cfg, f, indent=2)
    return directory


def latest_epoch(weights_dir: str) -> int:
    """Find the newest ``epoch_N.npz`` for resume (train.py:160-162 analog)."""
    best = 0
    if os.path.isdir(weights_dir):
        for f in os.listdir(weights_dir):
            m = re.fullmatch(r"epoch_(\d+)\.npz", f)
            if m:
                best = max(best, int(m.group(1)))
    return best
