"""Training step: loss decreases, checkpoint round-trip, DP mesh execution."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hvi_cidnet_tpu.models.cidnet import CIDNetConfig, init_cidnet
from hvi_cidnet_tpu.train.trainer import (
    TrainConfig,
    composite_loss,
    make_optimizer,
    make_train_step,
    nonfinite_guard,
    set_learning_rate,
)

pytestmark = pytest.mark.heavy
from hvi_cidnet_tpu.train.checkpoint import (
    latest_epoch,
    load_checkpoint,
    save_checkpoint,
)
from hvi_cidnet_tpu.parallel.mesh import batch_sharding, make_mesh, shard_params

TINY = CIDNetConfig(channels=(8, 8, 16, 32), heads=(1, 2, 4, 8))


def _batch(n=2, hw=16, seed=0):
    rng = np.random.default_rng(seed)
    low = jnp.asarray(rng.uniform(0, 0.3, (n, hw, hw, 3)).astype(np.float32))
    high = jnp.asarray(rng.uniform(0.4, 1.0, (n, hw, hw, 3)).astype(np.float32))
    return low, high


def _cfg(**kw):
    base = dict(model=TINY, use_perceptual=False, compute_dtype="float32")
    base.update(kw)
    return TrainConfig(**base)


def test_train_step_reduces_loss():
    cfg = _cfg()
    params = init_cidnet(jax.random.PRNGKey(0), TINY)
    opt = make_optimizer(cfg)
    opt_state = opt.init(params)
    step = make_train_step(cfg, opt)
    low, high = _batch()
    gamma = jnp.asarray(1.0)
    losses = []
    for _ in range(8):
        params, opt_state, loss, _ = step(params, opt_state, low, high, gamma, None)
        losses.append(float(loss))
        nonfinite_guard(losses[-1], 1, len(losses))
    assert losses[-1] < losses[0]


def test_density_k_receives_gradient():
    cfg = _cfg()
    params = init_cidnet(jax.random.PRNGKey(1), TINY)
    low, high = _batch(seed=2)
    grads = jax.grad(lambda p: composite_loss(p, low, high, jnp.asarray(1.0), None, cfg)[0])(params)
    assert abs(float(grads["trans.density_k"][0])) > 0


def test_gamma_augmentation_changes_loss():
    cfg = _cfg(gamma_aug=True)
    params = init_cidnet(jax.random.PRNGKey(2), TINY)
    low, high = _batch(seed=3)
    l1 = float(composite_loss(params, low, high, jnp.asarray(1.0), None, cfg)[0])
    l2 = float(composite_loss(params, low, high, jnp.asarray(0.7), None, cfg)[0])
    assert l1 != l2


def test_tnsm_loss_terms():
    tiny_tnsm = CIDNetConfig(channels=(8, 8, 16, 32), heads=(1, 2, 4, 8), variant="tnsm")
    cfg = _cfg(model=tiny_tnsm)
    params = init_cidnet(jax.random.PRNGKey(3), tiny_tnsm)
    low, high = _batch(seed=4)
    loss, aux = composite_loss(params, low, high, jnp.asarray(1.0), None, cfg)
    base = aux["loss_rgb"] + cfg.hvi_weight * aux["loss_hvi"]
    assert float(loss) > float(base)  # noise terms contribute


def test_lr_injection_per_epoch():
    cfg = _cfg()
    params = init_cidnet(jax.random.PRNGKey(4), TINY)
    opt = make_optimizer(cfg)
    opt_state = opt.init(params)
    opt_state = set_learning_rate(opt_state, 5e-5)
    inner = opt_state[-1]
    assert float(inner.hyperparams["learning_rate"]) == pytest.approx(5e-5)


def test_lr_injection_survives_reordered_chain():
    """tree_set finds learning_rate regardless of chain position."""
    import optax

    params = init_cidnet(jax.random.PRNGKey(4), TINY)
    opt = optax.chain(
        optax.inject_hyperparams(optax.adam)(learning_rate=1e-4),
        optax.clip_by_global_norm(0.01),  # inject stage no longer last
    )
    opt_state = set_learning_rate(opt.init(params), 5e-5)
    import optax.tree_utils as otu

    assert float(otu.tree_get(opt_state, "learning_rate")) == pytest.approx(5e-5)


def test_lr_injection_fails_loudly_without_inject_stage():
    """A chain with no learning_rate hyperparam must raise, not silently skip."""
    import optax

    params = init_cidnet(jax.random.PRNGKey(4), TINY)
    opt = optax.chain(optax.clip_by_global_norm(0.01), optax.adam(1e-4))
    with pytest.raises(KeyError):
        set_learning_rate(opt.init(params), 5e-5)


def test_checkpoint_roundtrip(tmp_path):
    cfg = _cfg()
    params = init_cidnet(jax.random.PRNGKey(5), TINY)
    opt = make_optimizer(cfg)
    opt_state = opt.init(params)
    path = str(tmp_path / "weights" / "epoch_7.npz")
    save_checkpoint(path, params, opt_state, epoch=7)
    p2, os2, epoch = load_checkpoint(path, opt_state_template=opt_state)
    assert epoch == 7
    assert set(p2) == set(params)
    for k in params:
        np.testing.assert_array_equal(np.asarray(p2[k]), np.asarray(params[k]))
    l1, _ = jax.tree_util.tree_flatten(opt_state)
    l2, _ = jax.tree_util.tree_flatten(os2)
    assert len(l1) == len(l2)
    assert latest_epoch(str(tmp_path / "weights")) == 7


def test_grad_clip_mode_clip_changes_update():
    low, high = _batch(seed=7)
    outs = {}
    for mode in ("faithful", "clip"):
        # fresh params per mode: the step donates its inputs
        params = init_cidnet(jax.random.PRNGKey(6), TINY)
        cfg = _cfg(grad_clip_mode=mode)
        opt = make_optimizer(cfg)
        opt_state = opt.init(params)
        step = make_train_step(cfg, opt)
        p, _, loss, _ = step(params, opt_state, low, high, jnp.asarray(1.0), None)
        outs[mode] = p["IE_block0.1.weight"]
    assert not np.allclose(np.asarray(outs["faithful"]), np.asarray(outs["clip"]))


def test_mesh_step_rejects_indivisible_batch():
    """The shard_map step's contract (batch % mesh size == 0) fails loudly
    with a config hint, not with shard_map's internal divisibility error."""
    mesh = make_mesh(axis_names=("data",))
    cfg = _cfg()
    params = init_cidnet(jax.random.PRNGKey(8), TINY)
    opt = make_optimizer(cfg)
    opt_state = opt.init(params)
    step = make_train_step(cfg, opt, mesh=mesh)
    low, high = _batch(n=12, seed=9)  # 12 % 8 != 0
    with pytest.raises(ValueError, match="batchSize"):
        step(params, opt_state, low, high, jnp.asarray(1.0), None)


def test_data_parallel_mesh_8dev():
    """Full train step over an 8-device mesh: batch sharded, params replicated;
    XLA inserts the gradient all-reduce (SURVEY.md §2.3 item 1)."""
    assert jax.device_count() >= 8, "conftest must fake 8 cpu devices"
    mesh = make_mesh(axis_names=("data",))
    cfg = _cfg()
    params = shard_params(init_cidnet(jax.random.PRNGKey(8), TINY), mesh)
    opt = make_optimizer(cfg)
    opt_state = opt.init(params)
    step = make_train_step(cfg, opt)
    low, high = _batch(n=8, seed=9)
    bs = batch_sharding(mesh)
    low = jax.device_put(low, bs)
    high = jax.device_put(high, bs)
    params, opt_state, loss, _ = step(params, opt_state, low, high, jnp.asarray(1.0), None)
    assert np.isfinite(float(loss))
    # params stay replicated after the update
    w = params["IE_block0.1.weight"]
    assert w.sharding.is_fully_replicated


def test_remat_loss_and_grads_exact():
    """--remat (jax.checkpoint on the forward) must be numerically exact:
    same ops, recomputed instead of stored."""
    from hvi_cidnet_tpu.train.trainer import composite_loss

    params = init_cidnet(jax.random.PRNGKey(5), TINY)
    low, high = _batch(seed=7)
    gamma = jnp.asarray(1.0)

    def run(remat):
        cfg = _cfg(remat=remat)
        (loss, _), grads = jax.value_and_grad(composite_loss, has_aux=True)(
            params, low, high, gamma, None, cfg
        )
        return float(loss), grads

    loss_a, g_a = run(False)
    loss_b, g_b = run(True)
    assert loss_a == loss_b
    for k in g_a:
        np.testing.assert_allclose(np.asarray(g_b[k]), np.asarray(g_a[k]), rtol=1e-6, atol=1e-7)


def test_grad_accum_exact_vs_full_batch():
    """--grad_accum N must reproduce the full-batch step exactly: every
    composite-loss term is a batch mean, so equal-sized microbatch-mean
    gradients equal the full-batch gradients up to float reassociation."""
    params0 = init_cidnet(jax.random.PRNGKey(11), TINY)
    low, high = _batch(n=4, seed=13)
    gamma = jnp.asarray(1.0)

    def run(accum):
        cfg = _cfg(grad_accum=accum)
        opt = make_optimizer(cfg)
        # the step donates (params, opt_state): give each run its own copy
        # so run(2) doesn't read run(1)'s deleted buffers
        params = jax.tree.map(jnp.copy, params0)
        opt_state = opt.init(params)
        step = make_train_step(cfg, opt)
        for _ in range(2):
            params, opt_state, loss, out = step(params, opt_state, low, high, gamma, None)
        return float(loss), params, out

    loss1, p1, out1 = run(1)
    for accum in (2, 4):
        la, pa, outa = run(accum)
        assert la == pytest.approx(loss1, rel=1e-6)
        for k in p1:
            # tolerance note: microbatch-summed grads differ from the
            # full-batch reduction only by float reassociation (~1e-8), but
            # Adam's 1/(sqrt(v)+eps) amplifies that for near-zero second
            # moments — observed max |delta| ~7e-6 on one element of 1530
            # after two steps.  rtol=1e-4/atol=1e-5 bounds reassociation
            # noise while still failing on any real math difference.
            np.testing.assert_allclose(
                np.asarray(pa[k]), np.asarray(p1[k]), rtol=1e-4, atol=1e-5,
                err_msg=f"param {k} diverges at grad_accum={accum}",
            )
        # the stacked-microbatch output reassembles to the full batch
        assert outa.shape == out1.shape
        np.testing.assert_allclose(np.asarray(outa), np.asarray(out1), rtol=1e-5, atol=1e-6)


def test_grad_accum_rejects_indivisible_batch():
    cfg = _cfg(grad_accum=3)
    params = init_cidnet(jax.random.PRNGKey(11), TINY)
    opt = make_optimizer(cfg)
    step = make_train_step(cfg, opt)
    low, high = _batch(n=4, seed=13)
    with pytest.raises(ValueError, match="grad_accum"):
        step(params, opt.init(params), low, high, jnp.asarray(1.0), None)


def test_grad_accum_on_mesh_matches_single():
    """grad_accum composes with the shard_map DP step: each microbatch still
    shards over the data axis and the result equals the accum-free step."""
    assert jax.device_count() >= 8, "conftest must fake 8 cpu devices"
    mesh = make_mesh(axis_names=("data",))
    params0 = shard_params(init_cidnet(jax.random.PRNGKey(11), TINY), mesh)
    low, high = _batch(n=16, seed=13)
    bs = batch_sharding(mesh)
    low, high = jax.device_put(low, bs), jax.device_put(high, bs)

    def run(accum):
        cfg = _cfg(grad_accum=accum)
        opt = make_optimizer(cfg)
        step = make_train_step(cfg, opt, mesh=mesh)
        # donation-safe copy per run (donate_argnums=(0,1) deletes the inputs)
        params = jax.tree.map(jnp.copy, params0)
        params, opt_state, loss, _ = step(params, opt.init(params), low, high, jnp.asarray(1.0), None)
        return float(loss), params

    loss1, p1 = run(1)
    loss2, p2 = run(2)
    assert loss2 == pytest.approx(loss1, rel=1e-6)
    for k in p1:
        # same reassociation-through-Adam tolerance as the single-device test
        np.testing.assert_allclose(np.asarray(p2[k]), np.asarray(p1[k]), rtol=1e-4, atol=1e-5)
