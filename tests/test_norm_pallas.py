"""Fused channel-LN Pallas kernel vs ops/conv.py:layer_norm_channels."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hvi_cidnet_tpu.ops.conv import layer_norm_channels
from hvi_cidnet_tpu.ops.norm_pallas import (
    layer_norm_channels_fused,
    layer_norm_pallas,
    use_ln_pallas,
)


def _data(c=36, h=10, w=6, b=4, dtype=jnp.float32, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((h, w, c, b)) * 2 + 0.5, dtype)
    wgt = jnp.asarray(rng.uniform(0.5, 1.5, (c,)), jnp.float32)
    bias = jnp.asarray(rng.standard_normal((c,)) * 0.1, jnp.float32)
    return x, wgt, bias


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("c", [8, 36, 144])
def test_kernel_matches_xla(dtype, c):
    x, wgt, bias = _data(c=c, dtype=dtype, seed=c)
    want = layer_norm_channels(x, wgt, bias)
    got = layer_norm_pallas(x, wgt, bias, interpret=True)
    # f32 path is the exact two-pass form -> bitwise-level agreement; bf16
    # shares the converting-reduce stats formula
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=2e-6 if dtype == jnp.float32 else 2e-2,
    )


def test_odd_height_tiles():
    x, wgt, bias = _data(h=7, w=5, c=12, b=3, seed=9)
    got = layer_norm_pallas(x, wgt, bias, interpret=True)
    want = layer_norm_channels(x, wgt, bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-6)


def test_gate_and_dispatch(monkeypatch):
    x, wgt, bias = _data(b=128)
    assert not use_ln_pallas(8)  # not lane-aligned
    assert not use_ln_pallas(128)  # CPU backend, no force
    monkeypatch.setenv("PALLAS_FORCE_INTERPRET", "1")
    monkeypatch.setenv("LN_USE_PALLAS", "1")  # kernel is opt-in (measured net negative at serving)
    assert use_ln_pallas(128)
    got = layer_norm_channels_fused(x, wgt, bias)
    want = layer_norm_channels(x, wgt, bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-6)


@pytest.mark.parametrize("c", [36, 144])
def test_conv_stats_seam_matches_reduce_stats(monkeypatch, c):
    """LN_STATS_CONV=1 computes bf16 LN stats via C->1 ones-convs on the
    conv emitter; fp32 accumulation makes it equal to the reduce path up
    to summation order (well inside bf16 output ULP)."""
    x, wgt, bias = _data(c=c, dtype=jnp.bfloat16, seed=c + 1)
    want = layer_norm_channels(x, wgt, bias)
    monkeypatch.setenv("LN_STATS_CONV", "1")
    got = layer_norm_channels(x, wgt, bias)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32), atol=2e-2)
    # fp32 inputs keep the exact two-pass form regardless of the seam
    xf, wf, bf = _data(c=c, dtype=jnp.float32, seed=c + 2)
    np.testing.assert_array_equal(
        np.asarray(layer_norm_channels(xf, wf, bf)),
        np.asarray(layer_norm_channels(xf, wf, bf)))


def test_gradients_route_through_xla_twin(monkeypatch):
    monkeypatch.setenv("PALLAS_FORCE_INTERPRET", "1")
    monkeypatch.setenv("LN_USE_PALLAS", "1")  # kernel is opt-in (measured net negative at serving)
    x, wgt, bias = _data(b=128, h=4, w=4, c=8, seed=3)

    def f_fused(x, w, b):
        return jnp.sum(layer_norm_channels_fused(x, w, b) ** 2)

    def f_xla(x, w, b):
        return jnp.sum(layer_norm_channels(x, w, b) ** 2)

    g1 = jax.grad(f_fused, argnums=(0, 1, 2))(x, wgt, bias)
    g2 = jax.grad(f_xla, argnums=(0, 1, 2))(x, wgt, bias)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5)
