"""Pallas conv3x3 kernel correctness (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hvi_cidnet_tpu.ops.conv_pallas import (
    _pallas_conv3x3,
    _xla_conv3x3,
    should_use_pallas_conv,
)


@pytest.mark.parametrize("pad_mode", ["zero", "edge"])
@pytest.mark.parametrize("shape", [(1, 16, 4, 24), (2, 32, 12, 40)])
def test_kernel_matches_xla(monkeypatch, pad_mode, shape):
    import jax.experimental.pallas as pl

    # interpret mode: route pallas_call through the interpreter
    orig = pl.pallas_call

    def interp_call(*args, **kw):
        kw["interpret"] = True
        return orig(*args, **kw)

    import hvi_cidnet_tpu.ops.conv_pallas as m

    monkeypatch.setattr(m.pl, "pallas_call", interp_call)

    b, h, c, w = shape
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, shape).astype(np.float32))
    wgt = jnp.asarray(rng.normal(0, 0.1, (3, 3, c, c + 4)).astype(np.float32))
    got = _pallas_conv3x3(x, wgt, pad_mode)
    want = _xla_conv3x3(x, wgt, pad_mode)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_defaults_off_on_cpu():
    assert should_use_pallas_conv() is False
