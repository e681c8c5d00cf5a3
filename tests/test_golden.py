"""Golden-value regression guard.

Catches silent numeric drift of the forward graph across refactors without
needing the torch reference installed (the parity suite remains the source
of truth; this is the fast tripwire).  Values recorded on CPU fp32 at commit
d7b8f28 after the NHCW layout work.
"""

import pytest
import numpy as np
import jax
import jax.numpy as jnp

from hvi_cidnet_tpu.models.cidnet import CIDNetConfig, cidnet_forward, init_cidnet

pytestmark = pytest.mark.heavy

TINY = CIDNetConfig(channels=(8, 8, 16, 32), heads=(1, 2, 4, 8))

GOLDEN_MEAN = 0.4935838282108307
GOLDEN_SUM = 379.0723876953125
GOLDEN_CORNER = np.array(
    [
        [[0.000266, 0.007056, 0.0161], [0.020697, 0.025074, 0.033529]],
        [[0.533917, 0.532636, 0.53935], [0.56949, 0.561638, 0.590817]],
    ]
)


def test_forward_golden_values():
    params = init_cidnet(jax.random.PRNGKey(42), TINY)
    x = jnp.asarray((np.arange(1 * 16 * 16 * 3).reshape(1, 16, 16, 3) % 97 / 96.0).astype(np.float32))
    out = np.asarray(cidnet_forward(params, x, TINY))
    assert out.shape == (1, 16, 16, 3)
    np.testing.assert_allclose(out.mean(), GOLDEN_MEAN, atol=1e-5)
    np.testing.assert_allclose(out.sum(), GOLDEN_SUM, atol=1e-2)
    np.testing.assert_allclose(out[0, :2, :2, :], GOLDEN_CORNER, atol=1e-5)


def test_param_count_matches_paper():
    """Base CIDNet ~1.88M params (SURVEY.md §2.4; arXiv 2502.20272)."""
    from hvi_cidnet_tpu.models.cidnet import count_params

    params = init_cidnet(jax.random.PRNGKey(0), CIDNetConfig(variant="base"))
    assert count_params(params) == 1_975_569
