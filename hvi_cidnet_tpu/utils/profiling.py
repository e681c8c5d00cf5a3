"""Tracing / profiling helpers — the framework's observability layer.

The reference's entire tracing surface is a manual ``time.time()`` around one
forward plus thop MAC counting (net_test.py:8-21, SURVEY.md §5.1).  Here:

* :func:`trace` — context manager around ``jax.profiler`` writing an xplane
  trace viewable in TensorBoard/XProf;
* :func:`op_breakdown` — parses a written trace into per-op device-time
  aggregates (the tool used for the layout work in ops/conv.py);
* :func:`model_card` — params / XLA-counted FLOPs / per-step wall time with
  a host-fetch completion barrier (``block_until_ready`` can return early
  through remote-TPU tunnels);
* :class:`StepTimer` — rolling per-step timing for training loops.
"""

from __future__ import annotations

import collections
import contextlib
import glob
import gzip
import json
import re
import time
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(log_dir: str):
    """``with trace('/tmp/trace'): run_steps()`` -> xplane trace on disk."""
    with jax.profiler.trace(log_dir):
        yield


def op_breakdown(log_dir: str, top: int = 20) -> Dict[str, float]:
    """Aggregate device-op durations (us) from the newest trace in log_dir."""
    paths = sorted(glob.glob(f"{log_dir}/plugins/profile/*/*.trace.json.gz"))
    if not paths:
        raise FileNotFoundError(f"no trace under {log_dir}")
    with gzip.open(paths[-1]) as f:
        data = json.load(f)
    agg: collections.Counter = collections.Counter()
    for e in data.get("traceEvents", []):
        name = e.get("name", "")
        if e.get("ph") != "X" or not e.get("dur") or name.startswith("$") or "(" in name:
            continue
        agg[re.sub(r"\.\d+$", "", name)] += e["dur"]
    return dict(agg.most_common(top))


def model_card(fn, *args, iters: int = 10) -> Dict[str, float]:
    """Compile ``fn(*args)`` and report flops (XLA cost analysis), bytes, and
    measured seconds/call."""
    jitted = jax.jit(fn)
    compiled = jitted.lower(*args).compile()
    cost = compiled.cost_analysis() or {}
    _ = float(jnp.sum(jitted(*args)))  # warmup + barrier
    t0 = time.perf_counter()
    out = None
    for _i in range(iters):
        out = jitted(*args)
    _ = float(jnp.sum(out))
    dt = (time.perf_counter() - t0) / iters
    return {
        "flops": float(cost.get("flops", float("nan"))),
        "bytes_accessed": float(cost.get("bytes accessed", float("nan"))),
        "seconds_per_call": dt,
    }


class StepTimer:
    """Rolling average step timer for training loops."""

    def __init__(self, window: int = 50):
        self.window = window
        self._times: collections.deque = collections.deque(maxlen=window)
        self._last: Optional[float] = None

    def tick(self) -> Optional[float]:
        now = time.perf_counter()
        if self._last is not None:
            self._times.append(now - self._last)
        self._last = now
        return self.mean()

    def mean(self) -> Optional[float]:
        return sum(self._times) / len(self._times) if self._times else None
