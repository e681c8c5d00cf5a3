"""Fused NormDownsample kernel correctness (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import hvi_cidnet_tpu.ops.fused_pallas as m


@pytest.mark.parametrize("shape,cout", [((1, 32, 4, 32), 8), ((2, 48, 12, 40), 12)])
def test_fused_down_matches_xla(monkeypatch, shape, cout):
    orig = m.pl.pallas_call

    def interp_call(*args, **kw):
        kw["interpret"] = True
        return orig(*args, **kw)

    monkeypatch.setattr(m.pl, "pallas_call", interp_call)

    b, h, c, w = shape
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, shape).astype(np.float32))
    wgt = jnp.asarray(rng.normal(0, 0.1, (3, 3, c, cout)).astype(np.float32))
    got = m._pallas_down(x, wgt, 0.25)
    want = m._xla_down(x, wgt, jnp.asarray(0.25))
    assert got.shape == (b, h // 2, cout, w // 2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_gradients_match_xla_path():
    x = jnp.asarray(np.random.default_rng(1).uniform(-1, 1, (1, 16, 4, 16)).astype(np.float32))
    w = jnp.asarray(np.random.default_rng(2).normal(0, 0.1, (3, 3, 4, 4)).astype(np.float32))

    g1 = jax.grad(lambda w_: jnp.sum(m.fused_norm_downsample(x, w_, 0.25) ** 2))(w)
    g2 = jax.grad(lambda w_: jnp.sum(m._xla_down(x, w_, jnp.asarray(0.25)) ** 2))(w)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-5)


def test_defaults_off_on_cpu():
    assert m.should_use_fused_down() is False
