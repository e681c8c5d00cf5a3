"""Fused resize kernel parity (interpret mode; the real-TPU run is exact —
0.0 vs the banded path at (64,48,36,128), recorded in docs/DESIGN.md)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from hvi_cidnet_tpu.ops.conv import prelu
from hvi_cidnet_tpu.ops.resize import scale_double_hwcb, scale_half_hwcb
from hvi_cidnet_tpu.ops.resize_pallas import (
    double_bilinear,
    half_prelu,
    scale_double_pallas,
    scale_half_pallas,
    use_resize_pallas,
)


@pytest.mark.parametrize("shape", [(64, 48, 36, 8), (50, 76, 3, 4), (40, 150, 17, 8)])
def test_half_prelu_kernel_matches_banded(shape):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    ref = prelu(scale_half_hwcb(x), 0.25)
    got = scale_half_pallas(x, prelu_alpha=0.25, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-6)


@pytest.mark.parametrize("shape", [(64, 48, 36, 8), (50, 75, 3, 4), (40, 150, 17, 8)])
def test_double_kernel_matches_banded(shape):
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    ref = scale_double_hwcb(x)
    got = scale_double_pallas(x, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-6)


def test_gate_requires_lane_aligned_batch():
    assert not use_resize_pallas(8)  # also false on CPU regardless of batch
    assert not use_resize_pallas(127)


def test_wrappers_grad_via_xla_twin():
    """custom_vjp backward must equal the XLA composition's gradient."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((16, 24, 5, 4)), jnp.float32)

    g1 = jax.grad(lambda t: jnp.sum(half_prelu(t, jnp.asarray(0.25)) ** 2))(x)
    g2 = jax.grad(lambda t: jnp.sum(prelu(scale_half_hwcb(t), 0.25) ** 2))(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-5)

    g3 = jax.grad(lambda t: jnp.sum(double_bilinear(t) ** 2))(x)
    g4 = jax.grad(lambda t: jnp.sum(scale_double_hwcb(t) ** 2))(x)
    np.testing.assert_allclose(np.asarray(g3), np.asarray(g4), atol=1e-5)
