"""Persistent XLA compilation cache for the serving/train entry points.

The reference pays no compile cost (eager CUDA); here every CLI's first
forward triggers a 20-40 s XLA compile per program shape, which dominates
cold-start for single-image serving (``cli/demo.py``) and short eval runs.
JAX's persistent compilation cache removes that on every run after the
first: compiled executables are keyed by (HLO, compiler version, device
kind) and re-loaded from disk instead of recompiled.

Opt-in via ``--compile_cache DIR`` on any CLI, or the ``HVI_COMPILE_CACHE``
environment variable (flag wins).  Safe to share one directory across CLIs
and model variants — the key includes the program, so there are no
collisions, only hits and misses.
"""

from __future__ import annotations

import os
from typing import Optional

ENV_VAR = "HVI_COMPILE_CACHE"


def enable_compilation_cache(path: Optional[str] = None) -> Optional[str]:
    """Point JAX's persistent compilation cache at ``path`` (or $HVI_COMPILE_CACHE).

    Returns the resolved cache directory, or None when neither the argument
    nor the environment variable is set (no-op).  Thresholds are lowered so
    even small programs (the demo CLI's single forward) are cached — the
    default min-compile-time gate would skip exactly the programs whose
    recompiles a serving deployment feels.
    """
    path = path or os.environ.get(ENV_VAR)
    if not path:
        return None
    path = os.path.abspath(os.path.expanduser(path))
    os.makedirs(path, exist_ok=True)
    import jax

    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    return path


def add_compile_cache_flag(parser) -> None:
    """Attach the shared ``--compile_cache`` flag to a CLI parser."""
    parser.add_argument(
        "--compile_cache",
        type=str,
        default=None,
        metavar="DIR",
        help="persistent XLA compilation-cache directory (or set "
        f"${ENV_VAR}); first run populates it, later runs skip the "
        "20-40s per-shape compile entirely",
    )
