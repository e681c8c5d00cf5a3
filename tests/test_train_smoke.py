"""Fast-lane trainer smoke: the one lane that must never be deselected.

Round-4 shipped red grad-accum tests because every trainer test lived in the
heavy lane (``pytestmark = heavy``) and the quick CI run (``-m "not heavy"``)
deselected all of them.  This module is deliberately NOT heavy: a single tiny
train step (including a second call, which catches donated-buffer reuse bugs)
runs in a few seconds on CPU and gates every trainer commit.

Reference workload: the training hot loop (/root/reference/train.py:39-90).
"""

import numpy as np
import jax
import jax.numpy as jnp

from hvi_cidnet_tpu.models.cidnet import CIDNetConfig, init_cidnet
from hvi_cidnet_tpu.train.trainer import (
    TrainConfig,
    make_optimizer,
    make_train_step,
    nonfinite_guard,
)

TINY = CIDNetConfig(channels=(4, 4, 8, 16), heads=(1, 2, 4, 8))


def test_train_step_smoke_two_steps():
    cfg = TrainConfig(model=TINY, use_perceptual=False, compute_dtype="float32")
    params = init_cidnet(jax.random.PRNGKey(0), TINY)
    opt = make_optimizer(cfg)
    opt_state = opt.init(params)
    step = make_train_step(cfg, opt)
    rng = np.random.default_rng(0)
    low = jnp.asarray(rng.uniform(0, 0.3, (2, 8, 8, 3)).astype(np.float32))
    high = jnp.asarray(rng.uniform(0.4, 1.0, (2, 8, 8, 3)).astype(np.float32))
    gamma = jnp.asarray(1.0)
    # two steps: the second consumes the donated outputs of the first, the
    # exact pattern the training loop runs (and the exact pattern that breaks
    # when donation is mishandled)
    params, opt_state, loss0, out = step(params, opt_state, low, high, gamma, None)
    params, opt_state, loss1, out = step(params, opt_state, low, high, gamma, None)
    nonfinite_guard(float(loss0), 1, 1)
    nonfinite_guard(float(loss1), 1, 2)
    assert out.shape == (2, 8, 8, 3)
    assert float(loss1) != float(loss0)


def test_train_step_grad_accum_smoke():
    """grad_accum path compiles and runs in the fast lane (exactness is
    gated by the heavy-lane equality tests)."""
    cfg = TrainConfig(
        model=TINY, use_perceptual=False, compute_dtype="float32", grad_accum=2
    )
    params = init_cidnet(jax.random.PRNGKey(1), TINY)
    opt = make_optimizer(cfg)
    opt_state = opt.init(params)
    step = make_train_step(cfg, opt)
    rng = np.random.default_rng(1)
    low = jnp.asarray(rng.uniform(0, 0.3, (4, 8, 8, 3)).astype(np.float32))
    high = jnp.asarray(rng.uniform(0.4, 1.0, (4, 8, 8, 3)).astype(np.float32))
    params, opt_state, loss, out = step(params, opt_state, low, high, jnp.asarray(1.0), None)
    nonfinite_guard(float(loss), 1, 1)
    assert out.shape == (4, 8, 8, 3)
