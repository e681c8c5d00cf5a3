"""Device mesh + sharding helpers — the framework's communication layer.

The reference is single-GPU with no collectives (SURVEY.md §2.3); here
multi-chip runs are first-class: a 1-D ``data`` mesh shards the batch, XLA
emits the gradient all-reduce over ICI/DCN automatically, and the same jitted
train step serves 1..N chips.  A second ``spatial`` axis is reserved for
sharding full-resolution images across chips at inference (halo exchange via
XLA collectives) — the reference's analog of sequence parallelism
(SURVEY.md §5.7).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    shape: Optional[Tuple[int, ...]] = None,
    axis_names: Sequence[str] = ("data",),
    devices=None,
) -> Mesh:
    """Build a mesh over all (or the given) devices.

    Default: 1-D data-parallel mesh over every addressable device.
    """
    devices = list(devices if devices is not None else jax.devices())
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, axis_names)


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def spatial_sharding(mesh: Mesh, axis: str = "spatial") -> NamedSharding:
    """Shard the H dim of NHWC images over a spatial axis (tiled inference)."""
    return NamedSharding(mesh, P(None, axis))


def shard_params(params, mesh: Mesh):
    """Replicate the parameter tree across the mesh."""
    rep = replicated(mesh)
    return jax.device_put(params, rep)
