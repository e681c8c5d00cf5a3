"""Async Orbax checkpointing — opt-in backend for the train loop.

The native ``.npz`` format (train/checkpoint.py) is synchronous: the step
loop stalls while process 0 serializes params + optimizer state to disk.
Orbax's async ``CheckpointManager`` snapshots the arrays and writes in a
background thread, so training resumes immediately — the TPU-idiomatic
checkpointing for long runs (SURVEY §5.4 names Orbax as the native-format
target; the reference itself blocks on ``torch.save``, train.py:93-101).

Differences from the npz backend, by design:
- **async**: ``save()`` returns before bytes hit disk; ``wait()`` (or
  ``close()``) barriers.  The manager also waits internally before starting
  the next save, so snapshots can never interleave.
- **multi-process**: every process calls ``save()``/``restore()`` (Orbax
  coordinates shard writes and barriers internally) — unlike npz, which the
  trainer guards to process 0 + broadcast.
- **layout**: one directory per step (``<dir>/<epoch>/``), manager-owned
  retention (``max_to_keep``).

Interchange with the rest of the stack stays through the flat param dict:
``restore()`` returns the same tree ``save_checkpoint``/``export_pth``
consume, so torch/.safetensors export works unchanged.
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class OrbaxCheckpoints:
    """Thin wrapper around ``orbax.checkpoint.CheckpointManager``.

    Parameters mirror the trainer's needs only: a directory, optional
    retention.  Items saved per step: ``params`` (flat name->array dict) and
    ``opt_state`` (the optax state pytree, restored against a template so
    namedtuple structure survives).
    """

    def __init__(self, directory: str, max_to_keep: Optional[int] = None):
        import orbax.checkpoint as ocp

        self._ocp = ocp
        self._dir = os.path.abspath(directory)
        self._mgr = ocp.CheckpointManager(
            self._dir,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep,
                enable_async_checkpointing=True,
            ),
        )

    def save(self, epoch: int, params: Dict[str, jnp.ndarray], opt_state=None) -> None:
        """Queue an async snapshot of (params, opt_state) as step ``epoch``."""
        ocp = self._ocp
        items = {"params": ocp.args.StandardSave(dict(params))}
        if opt_state is not None:
            items["opt_state"] = ocp.args.StandardSave(opt_state)
        self._mgr.save(epoch, args=ocp.args.Composite(**items))

    def restore(
        self, epoch: Optional[int] = None, params_template=None, opt_state_template=None
    ) -> Tuple[Dict[str, jnp.ndarray], Optional[object], int]:
        """Restore -> (params, opt_state|None, epoch).  epoch=None = latest.

        Leaves come back as host numpy (uncommitted), matching the npz
        loader's contract: orbax otherwise restores arrays COMMITTED to
        device 0, and jit refuses to mix those with the trainer's
        mesh-sharded batch arrays ("incompatible devices").
        """
        ocp = self._ocp
        step = self.latest_epoch() if epoch is None else int(epoch)
        if step <= 0:
            raise FileNotFoundError(f"no orbax checkpoint under {self._dir}")
        items = {"params": ocp.args.StandardRestore(params_template)}
        # probe the step layout on disk — item_metadata() logs spurious
        # "could not be restored" warnings for this query
        has_opt = opt_state_template is not None and os.path.isdir(
            os.path.join(self._dir, str(step), "opt_state")
        )
        if has_opt:
            items["opt_state"] = ocp.args.StandardRestore(opt_state_template)
        restored = self._mgr.restore(step, args=ocp.args.Composite(**items))
        to_host = lambda t: jax.tree.map(np.asarray, t)
        params = dict(to_host(restored["params"]))
        opt_state = to_host(restored["opt_state"]) if has_opt else None
        return params, opt_state, step

    def latest_epoch(self) -> int:
        """Newest saved step, 0 when none (matches checkpoint.latest_epoch)."""
        step = self._mgr.latest_step()
        return 0 if step is None else int(step)

    def wait(self) -> None:
        """Barrier until all queued async saves are durable on disk."""
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self._mgr.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False
