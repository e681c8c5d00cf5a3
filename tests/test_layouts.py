"""HWCB serving-contract layout: input_layout="hwcb" must equal NHWC.

The serving contract lets the host pipeline pack batches directly into the
model's internal (H, W, C, B) layout so the device program contains no
boundary relayouts (models/cidnet.py:cidnet_forward).  Measured neutral on
throughput at serving geometry (docs/ROUND3_NOTES.md) but it removes the
Pallas HVI dependency at the boundary; correctness must be exact.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from hvi_cidnet_tpu.models.cidnet import CIDNetConfig, cidnet_forward, init_cidnet
from hvi_cidnet_tpu.ops.hvi import hvi_to_rgb, rgb_to_hvi

TINY = CIDNetConfig(channels=(8, 8, 16, 32), heads=(1, 2, 4, 8))
TINY_TNSM = CIDNetConfig(variant="tnsm", channels=(8, 8, 16, 32), heads=(1, 2, 4, 8))


def _x(shape=(2, 16, 24, 3), seed=0):
    return jnp.asarray(np.random.default_rng(seed).uniform(0, 1, shape), jnp.float32)


def test_rgb_to_hvi_channel_axis():
    x = _x()
    ref = rgb_to_hvi(x, jnp.asarray(0.3))
    got = rgb_to_hvi(jnp.moveaxis(x, -1, 1), jnp.asarray(0.3), channel_axis=1)
    np.testing.assert_allclose(np.asarray(jnp.moveaxis(got, 1, -1)), np.asarray(ref), atol=0)


@pytest.mark.parametrize("gates", [{}, {"gated": True}, {"gated2": True, "alpha": 0.84}])
def test_hvi_to_rgb_channel_axis(gates):
    hvi = rgb_to_hvi(_x(), jnp.asarray(0.3))
    ref = hvi_to_rgb(hvi, jnp.asarray(0.3), **gates)
    got = hvi_to_rgb(jnp.moveaxis(hvi, -1, 1), jnp.asarray(0.3), channel_axis=1, **gates)
    np.testing.assert_allclose(np.asarray(jnp.moveaxis(got, 1, -1)), np.asarray(ref), atol=0)


def test_forward_hwcb_matches_nhwc():
    params = init_cidnet(jax.random.PRNGKey(0), TINY)
    x = _x()
    ref = cidnet_forward(params, x, TINY, use_pallas=False)
    got = cidnet_forward(
        params, jnp.transpose(x, (1, 2, 3, 0)), TINY, use_pallas=False, input_layout="hwcb"
    )
    np.testing.assert_allclose(
        np.asarray(jnp.transpose(got, (3, 0, 1, 2))), np.asarray(ref), atol=1e-6
    )


def test_forward_hwcb_tnsm_training_noise_map():
    params = init_cidnet(jax.random.PRNGKey(1), TINY_TNSM)
    x = _x(seed=2)
    ref, ref_noise = cidnet_forward(params, x, TINY_TNSM, use_pallas=False, training=True)
    got, got_noise = cidnet_forward(
        params,
        jnp.transpose(x, (1, 2, 3, 0)),
        TINY_TNSM,
        use_pallas=False,
        training=True,
        input_layout="hwcb",
    )
    np.testing.assert_allclose(
        np.asarray(jnp.transpose(got, (3, 0, 1, 2))), np.asarray(ref), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(jnp.transpose(got_noise, (3, 0, 1, 2))), np.asarray(ref_noise), atol=1e-6
    )


def test_forward_rejects_unknown_layout():
    params = init_cidnet(jax.random.PRNGKey(0), TINY)
    with pytest.raises(ValueError, match="input_layout"):
        cidnet_forward(params, _x(), TINY, input_layout="nchw")


def test_forward_rejects_non_x8_extent():
    """Non-x8 H/W fails loudly at entry, not as a concat error mid-UNet."""
    params = init_cidnet(jax.random.PRNGKey(0), TINY)
    bad = jnp.zeros((1, 20, 24, 3), jnp.float32)  # H=20 not x8
    with pytest.raises(ValueError, match="multiples of 8"):
        cidnet_forward(params, bad, TINY)
    bad_hwcb = jnp.zeros((24, 20, 3, 1), jnp.float32)  # W=20 not x8
    with pytest.raises(ValueError, match="multiples of 8"):
        cidnet_forward(params, bad_hwcb, TINY, input_layout="hwcb")


def test_forward_hwcb_pallas_io_matches_nhwc(monkeypatch):
    """The hwcb-io Pallas arm (zero lane-crossing transposes, round 5) must
    reproduce the NHWC forward exactly like the XLA hwcb arm does."""
    monkeypatch.setenv("PALLAS_FORCE_INTERPRET", "1")
    from hvi_cidnet_tpu.ops.hvi_pallas import should_use_pallas

    assert should_use_pallas()  # interpret mode counts as executable
    params = init_cidnet(jax.random.PRNGKey(0), TINY)
    x = _x()
    ref = cidnet_forward(params, x, TINY)  # NHWC path (Pallas, interpret)
    got = cidnet_forward(
        params, jnp.transpose(x, (1, 2, 3, 0)), TINY, input_layout="hwcb"
    )
    np.testing.assert_allclose(
        np.asarray(jnp.transpose(got, (3, 0, 1, 2))), np.asarray(ref), atol=3e-6
    )
