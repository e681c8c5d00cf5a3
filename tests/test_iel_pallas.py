"""Fused IEL-branch kernel (tanh(dw2(dw1(y))) + dw1(y)) vs the XLA twin."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hvi_cidnet_tpu.ops.conv import dwconv3x3
from hvi_cidnet_tpu.ops.iel_pallas import (
    _pick_tiles,
    _xla_branch,
    iel_branch,
    iel_branch_pallas,
    use_iel_pallas,
)


def _data(h=12, w=10, c=20, b=4, dtype=jnp.float32, seed=0):
    rng = np.random.default_rng(seed)
    y = jnp.asarray(rng.standard_normal((h, w, c, b)) * 0.7, dtype)
    w1 = jnp.asarray(rng.standard_normal((3, 3, 1, c)) * 0.3, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((3, 3, 1, c)) * 0.3, jnp.float32)
    return y, w1, w2


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("hw", [(12, 10), (8, 5), (2, 3)])
def test_kernel_matches_xla_twin(dtype, hw):
    h, w = hw
    y, w1, w2 = _data(h=h, w=w, dtype=dtype, seed=h * w)
    want = _xla_branch(y, w1, w2)
    got = iel_branch_pallas(y, w1, w2, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=1e-5 if dtype == jnp.float32 else 4e-2,  # bf16: 1-ULP rounding-order slack
    )


def test_channel_tiling_partial_blocks():
    """c > ct exercises the channel grid including a partial last block."""
    y, w1, w2 = _data(h=4, w=6, c=36, b=2, seed=7)
    # force tiny ct by monkeying the picker indirectly: c=36 with ct<=64
    got = iel_branch_pallas(y, w1, w2, interpret=True)
    want = _xla_branch(y, w1, w2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_zero_same_borders_match():
    """Border rows/cols take zero-'SAME' padding, same as dwconv3x3."""
    y, w1, w2 = _data(h=6, w=4, c=8, b=2, seed=3)
    got = iel_branch_pallas(y, w1, w2, interpret=True)
    t1 = dwconv3x3(y, w1)
    want = jnp.tanh(dwconv3x3(t1, w2)) + t1
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_gate_and_dispatch(monkeypatch):
    assert not use_iel_pallas(8)
    assert not use_iel_pallas(128)  # cpu without force
    monkeypatch.setenv("PALLAS_FORCE_INTERPRET", "1")
    monkeypatch.setenv("IEL_USE_PALLAS", "1")  # kernel is opt-in (measured net negative at serving)
    assert use_iel_pallas(128)
    y, w1, w2 = _data(h=4, w=6, c=8, b=128, seed=5)
    got = iel_branch(y, w1, w2)
    want = _xla_branch(y, w1, w2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)
    # odd H -> picker refuses -> XLA fallback works
    y2, w1b, w2b = _data(h=5, w=6, c=8, b=128, seed=6)
    assert _pick_tiles(5, 6, 8, 128, 4) is None
    out = iel_branch(y2, w1b, w2b)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(_xla_branch(y2, w1b, w2b)), atol=1e-5
    )


def test_gradients_route_through_xla_twin(monkeypatch):
    monkeypatch.setenv("PALLAS_FORCE_INTERPRET", "1")
    monkeypatch.setenv("IEL_USE_PALLAS", "1")  # kernel is opt-in (measured net negative at serving)
    y, w1, w2 = _data(h=4, w=4, c=8, b=128, seed=9)

    def f_fused(y, w1, w2):
        return jnp.sum(iel_branch(y, w1, w2) ** 2)

    def f_xla(y, w1, w2):
        return jnp.sum(_xla_branch(y, w1, w2) ** 2)

    g1 = jax.grad(f_fused, argnums=(0, 1, 2))(y, w1, w2)
    g2 = jax.grad(f_xla, argnums=(0, 1, 2))(y, w1, w2)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5)
