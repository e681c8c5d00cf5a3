"""Multi-chip inference correctness on the 8-fake-device mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hvi_cidnet_tpu.models.cidnet import CIDNetConfig, HVIGates, cidnet_forward, init_cidnet
from hvi_cidnet_tpu.parallel.inference import dp_enhance_fn, spatial_enhance_fn
from hvi_cidnet_tpu.parallel.mesh import make_mesh

TINY = CIDNetConfig(channels=(8, 8, 16, 32), heads=(1, 2, 4, 8))


@pytest.fixture(scope="module")
def setup():
    assert jax.device_count() >= 8
    mesh = make_mesh(axis_names=("data",))
    params = init_cidnet(jax.random.PRNGKey(0), TINY)
    rng = np.random.default_rng(0)
    batch = jnp.asarray(rng.uniform(0, 1, (8, 64, 48, 3)).astype(np.float32))
    single = np.clip(
        np.asarray(cidnet_forward(params, batch, TINY, HVIGates())), 0, 1
    )
    return mesh, params, batch, single


def test_dp_matches_single_device(setup):
    mesh, params, batch, single = setup
    fn, bs, rep = dp_enhance_fn(mesh, TINY, HVIGates())
    out = fn(jax.device_put(params, rep), jax.device_put(batch, bs))
    np.testing.assert_allclose(np.asarray(out), single, atol=1e-6)


def test_spatial_sharding_matches_single_device(setup):
    """Rows sharded over 8 chips: XLA inserts halo exchanges for convs and
    resizes; results must match the unsharded forward."""
    mesh, params, batch, single = setup
    fn, rs, rep = spatial_enhance_fn(mesh, TINY, HVIGates())
    out = fn(jax.device_put(params, rep), jax.device_put(batch, rs))
    np.testing.assert_allclose(np.asarray(out), single, atol=1e-5)
