"""Multi-chip inference: data-parallel batches and spatially-sharded images.

The reference is single-GPU (SURVEY.md §2.3); these are the TPU-native
scaling paths:

* ``dp_enhance_fn`` — batch sharded over the ``data`` mesh axis, params
  replicated, body wrapped in ``jax.shard_map``: each chip traces the
  forward on its *local* shard, so the Mosaic kernels (which have no GSPMD
  partitioner) run legally per chip and their lane-alignment gates see the
  per-chip batch.  Embarrassingly parallel — no collectives.
* ``spatial_enhance_fn`` — ONE image's rows sharded over the mesh (the
  reference's analog of sequence parallelism, SURVEY.md §5.7): XLA's SPMD
  partitioner inserts halo exchanges for the 3x3 convs and resizes over ICI
  automatically.  Because GSPMD owns this program, ``use_pallas=False`` is
  passed through the forward — no Mosaic kernel ever lands in a
  GSPMD-partitioned trace (see ops/pallas_gate.py for the full contract).
* ``dp_spatial_enhance_fn`` — the composition on one 2-D mesh: batch over
  ``data`` and each image's rows over ``spatial`` (full-res pod serving:
  e.g. 4 frames at a time, each split across 2 chips).

Both return the SAME numbers as single-chip execution (mesh tests assert
bitwise-close equality, with kernels force-enabled in interpret mode).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from hvi_cidnet_tpu.models.cidnet import CIDNetConfig, HVIGates, cidnet_forward


def dp_enhance_fn(mesh: Mesh, config: CIDNetConfig, gates: HVIGates, *, gamma: float = 1.0, compute_dtype=jnp.float32, axis: str = "data"):
    """Jitted (params, batch NHWC) -> enhanced batch, batch sharded on mesh.

    The global batch must divide the mesh size (the driver's serving
    contract); each shard runs the single-chip program, kernels included.
    """
    batch_sharding = NamedSharding(mesh, P(axis))
    replicated = NamedSharding(mesh, P())

    def local_fn(params, x):
        y = jnp.power(x, gamma) if gamma != 1.0 else x
        out = cidnet_forward(params, y, config, gates, compute_dtype=compute_dtype)
        if config.variant == "tnsm":
            out = out[0]
        return jnp.clip(out.astype(jnp.float32), 0.0, 1.0)

    mapped = jax.shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(), P(axis)),
        out_specs=P(axis),
        # pallas_call out_shapes carry no varying-mesh-axes metadata;
        # the body is collective-free, so the vma checker adds nothing
        check_vma=False,
    )

    @jax.jit
    def fn(params, x):
        if x.shape[0] % mesh.size:
            raise ValueError(
                f"global batch {x.shape[0]} must be divisible by the "
                f"{mesh.size}-device mesh for dp_enhance_fn — pad the tail "
                "batch (eval/evaluator.py buckets do this) or drop it"
            )
        return mapped(params, x)

    return fn, batch_sharding, replicated


def dp_spatial_enhance_fn(
    mesh: Mesh,
    config: CIDNetConfig,
    gates: HVIGates,
    *,
    gamma: float = 1.0,
    compute_dtype=jnp.float32,
    batch_axis: str = "data",
    row_axis: str = "spatial",
):
    """Jitted forward over a 2-D (data x spatial) mesh: batch split over
    ``batch_axis`` AND each image's rows split over ``row_axis``.

    The scale composition for full-res pod serving (SURVEY §5.7 + §2.3): a
    host's 8 chips can serve e.g. 4 images at a time with each 1280x720
    frame split across 2 chips.  GSPMD owns the partitioning (halo
    exchanges for the 3x3 convs/resizes ride ICI), so Mosaic kernels are
    excluded from this trace like ``spatial_enhance_fn``.  H pads to
    8 * row-shards inside the program and crops back (same contract).
    """
    n_batch = mesh.shape[batch_axis]
    n_row = mesh.shape[row_axis]
    sharding = NamedSharding(mesh, P(batch_axis, row_axis))
    replicated = NamedSharding(mesh, P())

    @partial(jax.jit, in_shardings=(replicated, sharding), out_shardings=sharding)
    def fn(params, x):
        if x.shape[0] % n_batch:
            raise ValueError(
                f"global batch {x.shape[0]} must be divisible by the "
                f"{n_batch}-way {batch_axis!r} axis for dp_spatial_enhance_fn"
            )
        h, w = x.shape[1], x.shape[2]
        mh = 8 * n_row
        ph = (mh - h % mh) % mh
        pw = (8 - w % 8) % 8
        if ph or pw:
            mode = "reflect" if ph < h and pw < w else "edge"
            x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)), mode=mode)
        y = jnp.power(x, gamma) if gamma != 1.0 else x
        out = cidnet_forward(params, y, config, gates, compute_dtype=compute_dtype, use_pallas=False)
        if config.variant == "tnsm":
            out = out[0]
        out = out[:, :h, :w]
        return jnp.clip(out.astype(jnp.float32), 0.0, 1.0)

    return fn, sharding, replicated


def spatial_enhance_fn(mesh: Mesh, config: CIDNetConfig, gates: HVIGates, *, gamma: float = 1.0, compute_dtype=jnp.float32, axis: Optional[str] = None):
    """Jitted forward with image rows sharded across chips (halo exchange by
    XLA).

    Shard-divisibility is handled inside the program: H is reflect-padded to
    a multiple of 8 * mesh size (W to a multiple of 8) and the output is
    cropped back — e.g. a full-res LOL-Blur 1280x720 frame pads 720 -> 768
    on an 8-chip mesh, the same pad-and-crop contract the reference applies
    for its /8 constraint (eval_sets.py:23-29, demo.py:46-52).
    """
    axis = axis or mesh.axis_names[0]
    n_shard = mesh.shape[axis]
    row_sharding = NamedSharding(mesh, P(None, axis))
    replicated = NamedSharding(mesh, P())

    @partial(jax.jit, in_shardings=(replicated, row_sharding), out_shardings=row_sharding)
    def fn(params, x):
        h, w = x.shape[1], x.shape[2]
        mh = 8 * n_shard
        ph = (mh - h % mh) % mh
        pw = (8 - w % 8) % 8
        if ph or pw:
            # reflect needs pad < dim; a sliver image (e.g. H=30 on an 8-chip
            # mesh needing ph=34) falls back to edge mode, mirroring
            # eval/evaluator.py:_pad_to
            mode = "reflect" if ph < h and pw < w else "edge"
            x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)), mode=mode)
        y = jnp.power(x, gamma) if gamma != 1.0 else x
        # GSPMD partitions this trace -> Mosaic kernels are disallowed
        out = cidnet_forward(params, y, config, gates, compute_dtype=compute_dtype, use_pallas=False)
        if config.variant == "tnsm":
            out = out[0]
        out = out[:, :h, :w]
        return jnp.clip(out.astype(jnp.float32), 0.0, 1.0)

    return fn, row_sharding, replicated
