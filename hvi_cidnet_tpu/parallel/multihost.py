"""Multi-process (pod-scale) data-parallel input feed.

The reference is a single-GPU trainer (train.py:34); at pod scale each host
process addresses only its local chips, so the input pipeline must shard the
*production* of every global batch across processes and assemble a global
``jax.Array`` without any host ever materializing the full batch
(SURVEY.md §2.3 item 2, §5.8).

Launch contract (one process per host, standard JAX distributed runtime):

    jax.distributed.initialize()          # or initialize_distributed()
    mesh = make_mesh(axis_names=("data",))
    loader = MultiHostTrainLoader(dataset, global_batch, mesh=mesh, seed=...)
    for low, high in loader.epoch(): ...  # low/high are GLOBAL sharded Arrays

Every process must run the same schedule (same seed -> same global index
order); each decodes only the slice of each batch that lands on its local
devices, and ``jax.make_array_from_process_local_data`` stitches the
per-process shards into one global array addressed by the jitted step.
Single-process runs (including the 8-fake-device CPU mesh tests) take the
identical code path with ``process_count == 1``.
"""

from __future__ import annotations

from typing import Iterator, Optional, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from hvi_cidnet_tpu.data.pipeline import TrainLoader


def initialize_distributed(**kwargs) -> None:
    """Idempotent ``jax.distributed.initialize`` wrapper (pod launch).

    Only the already-initialized case is tolerated; genuine launch failures
    (unreachable coordinator, bad env) propagate — a pod process silently
    continuing as single-process would hang or misassemble global batches
    later in ``jax.make_array_from_process_local_data`` (ADVICE r3).
    """
    if jax.distributed.is_initialized():
        return
    try:
        jax.distributed.initialize(**kwargs)
    except RuntimeError as e:
        if "already initialized" in str(e).lower():
            return
        raise


def process_local_slice(
    global_batch: int,
    *,
    process_index: Optional[int] = None,
    process_count: Optional[int] = None,
) -> slice:
    """This process's contiguous row range of every global batch.

    Row-contiguous slicing matches ``P("data")`` sharding when the mesh's
    device order follows process order (the default for TPU pod slices):
    process p's local devices hold rows [p*per, (p+1)*per).
    """
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    if global_batch % pc:
        raise ValueError(f"global batch {global_batch} not divisible by {pc} processes")
    per = global_batch // pc
    return slice(pi * per, (pi + 1) * per)


def sharding_local_slice(
    sharding: NamedSharding,
    global_batch: int,
    *,
    process_index: Optional[int] = None,
) -> slice:
    """Row range each global batch assigns to this process's devices,
    derived from the sharding's actual device→index map.

    Unlike ``process_local_slice`` this is correct for topology-reordered
    meshes where a process's devices do NOT own rows
    ``[p*per, (p+1)*per)`` (ADVICE r3: ``make_array_from_process_local_data``
    places local rows wherever the local devices sit in the global order).
    Raises if the process's rows are not contiguous — the row-slice loader
    contract requires one contiguous block per process.
    """
    pi = jax.process_index() if process_index is None else process_index
    spans = sorted(
        (
            idx[0].start or 0,
            global_batch if idx[0].stop is None else idx[0].stop,
        )
        for d, idx in sharding.devices_indices_map((global_batch,)).items()
        if d.process_index == pi
    )
    if not spans:
        raise ValueError(f"process {pi} owns no rows of the batch sharding")
    start, stop = spans[0]
    for a, b in spans[1:]:
        if a > stop:
            raise ValueError(
                f"process {pi} owns non-contiguous batch rows {spans}; "
                "the multi-host loader requires one contiguous block per "
                "process — reorder the mesh (e.g. jax.make_mesh default) "
                "so process-local devices are adjacent on the data axis"
            )
        stop = max(stop, b)
    return slice(start, stop)


class MultiHostTrainLoader:
    """Process-sharded batch producer yielding global sharded ``jax.Array``s.

    Wraps the single-process ``TrainLoader`` machinery: every process draws
    the SAME global index permutation (shared seed), decodes only its
    ``process_local_slice`` of each batch, and assembles the global array
    with ``jax.make_array_from_process_local_data``.
    """

    def __init__(
        self,
        dataset,
        global_batch: int,
        *,
        mesh: Mesh,
        axis: str = "data",
        seed: int = 0,
        num_threads: int = 8,
        shuffle: bool = True,
        prefetch: int = 4,
        process_index: Optional[int] = None,
        process_count: Optional[int] = None,
    ):
        self.global_batch = global_batch
        self.sharding = NamedSharding(mesh, P(axis))
        if process_count is not None:
            # test override: simulate a pod's row math without real processes
            self.local = process_local_slice(
                global_batch, process_index=process_index, process_count=process_count
            )
        else:
            # derive from the sharding's device→index map — correct even for
            # topology-reordered meshes (ADVICE r3)
            self.local = sharding_local_slice(
                self.sharding, global_batch, process_index=process_index
            )
        # the inner loader produces *local* batches on the host (prefetched
        # via its producer thread); global-array assembly happens here.
        # batch_rows makes every process advance the SAME augmentation rng
        # stream for the full global batch but decode only its slice — crops/
        # flips stay deterministic and process-independent.
        self._inner = TrainLoader(
            dataset,
            global_batch,
            seed=seed,
            num_threads=num_threads,
            shuffle=shuffle,
            prefetch=prefetch,
            sharding=None,
            device_put=False,
            batch_rows=self.local,
        )
        self.steps_per_epoch = self._inner.steps_per_epoch

    def close(self):
        self._inner.close()

    def epoch(self) -> Iterator[Tuple[jax.Array, jax.Array]]:
        """One epoch of GLOBAL sharded arrays (prefetched local decode)."""
        for lows, highs in self._inner.epoch():
            glow = jax.make_array_from_process_local_data(self.sharding, lows)
            ghigh = jax.make_array_from_process_local_data(self.sharding, highs)
            yield glow, ghigh
