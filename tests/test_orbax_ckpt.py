"""Async Orbax checkpoint backend (train/orbax_ckpt.py + cli/train.py
--ckpt_backend orbax).

The npz backend is synchronous and process-0-guarded; the orbax backend
writes asynchronously with manager-owned retention and must round-trip the
exact same (params, opt_state, epoch) contract.
"""

from __future__ import annotations

import os
import re
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from hvi_cidnet_tpu.train.orbax_ckpt import OrbaxCheckpoints

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _tree(scale: float):
    return {
        "conv.weight": jnp.full((4, 3, 3, 3), scale, jnp.float32),
        "ln.bias": jnp.arange(4, dtype=jnp.float32) * scale,
    }


def test_round_trip_params_opt_state_epoch(tmp_path):
    params = _tree(1.0)
    opt = optax.chain(optax.clip_by_global_norm(0.01), optax.adam(1e-4))
    opt_state = opt.init(params)
    with OrbaxCheckpoints(str(tmp_path / "ck")) as ck:
        ck.save(3, params, opt_state)
        ck.wait()
        p, s, e = ck.restore(3, params, opt_state)
    assert e == 3
    for k in params:
        np.testing.assert_array_equal(np.asarray(p[k]), np.asarray(params[k]))
        # host numpy (uncommitted), npz-loader contract: committed device-0
        # arrays would break the mesh-sharded train step on resume
        assert isinstance(p[k], np.ndarray), type(p[k])
    assert jax.tree_util.tree_structure(s) == jax.tree_util.tree_structure(opt_state)
    assert all(isinstance(l, np.ndarray) for l in jax.tree_util.tree_leaves(s))


def test_latest_and_retention(tmp_path):
    params = _tree(1.0)
    with OrbaxCheckpoints(str(tmp_path / "ck"), max_to_keep=2) as ck:
        assert ck.latest_epoch() == 0
        for epoch in (1, 2, 3):
            ck.save(epoch, _tree(float(epoch)))
        ck.wait()
        assert ck.latest_epoch() == 3
        # retention: only the newest 2 survive
        p, s, e = ck.restore(None, params)
        assert e == 3 and s is None
        assert float(p["conv.weight"][0, 0, 0, 0]) == 3.0
        with pytest.raises(Exception):
            ck.restore(1, params)


def test_restore_missing_raises(tmp_path):
    with OrbaxCheckpoints(str(tmp_path / "empty")) as ck:
        with pytest.raises(FileNotFoundError):
            ck.restore(None, _tree(1.0))


def test_save_without_opt_state(tmp_path):
    params = _tree(2.0)
    opt_state = optax.adam(1e-4).init(params)
    with OrbaxCheckpoints(str(tmp_path / "ck")) as ck:
        ck.save(1, params)  # weights-only snapshot (reference-style)
        ck.wait()
        p, s, e = ck.restore(1, params, opt_state)
    assert s is None and e == 1
    assert float(p["ln.bias"][1]) == 2.0


def test_load_any_reads_orbax_dir(tmp_path):
    """Eval CLIs must consume orbax training output without conversion."""
    from hvi_cidnet_tpu.train.checkpoint import load_any

    params = _tree(5.0)
    with OrbaxCheckpoints(str(tmp_path / "ck")) as ck:
        ck.save(1, _tree(1.0))
        ck.save(2, params)
        ck.wait()
    loaded = load_any(str(tmp_path / "ck"))
    assert set(loaded) == set(params)
    np.testing.assert_array_equal(np.asarray(loaded["ln.bias"]), np.asarray(params["ln.bias"]))


def test_load_any_rejects_unknown_dir(tmp_path):
    from hvi_cidnet_tpu.train.checkpoint import load_any

    (tmp_path / "junk").mkdir()
    with pytest.raises(FileNotFoundError):
        load_any(str(tmp_path / "junk"))


# ---------------------------------------------------------------- CLI lane

pytestmark_heavy = pytest.mark.heavy

TRAIN_ARGS = [
    "--synthetic_steps", "2", "--nEpochs", "2", "--snapshots", "1",
    "--batchSize", "8", "--cropSize", "32", "--use_perceptual", "false",
    "--lmot", "false", "--variant", "base", "--seed", "7", "--threads", "2",
    "--ckpt_backend", "orbax",
]


def _env() -> dict:
    env = {k: v for k, v in os.environ.items() if k != "PALLAS_AXON_POOL_IPS"}
    env["JAX_PLATFORMS"] = "cpu"
    flags = [f for f in env.get("XLA_FLAGS", "").split() if "host_platform_device_count" not in f]
    env["XLA_FLAGS"] = " ".join(flags + ["--xla_force_host_platform_device_count=8"])
    return env


@pytest.mark.heavy
def test_train_cli_orbax_backend_and_resume(tmp_path):
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "cli", "train.py"), *TRAIN_ARGS,
         "--val_folder", str(tmp_path / "v1")],
        cwd=tmp_path, capture_output=True, text=True, env=_env(), timeout=900,
    )
    assert r.returncode == 0, r.stdout + r.stderr
    assert "Checkpoint queued (orbax step 2)" in r.stdout
    assert "orbax checkpoints durable" in r.stdout
    ck_dir = tmp_path / "weights" / "train" / "orbax"
    steps = sorted(d.name for d in ck_dir.iterdir() if d.name.isdigit())
    assert steps == ["1", "2"], steps
    # orbax replaces, not duplicates, the npz files
    assert not list((tmp_path / "weights" / "train").glob("epoch_*.npz"))

    losses_leg1 = [float(m) for m in re.findall(r"Loss: ([0-9.]+)", r.stdout)]
    assert len(losses_leg1) == 2

    resume = [*TRAIN_ARGS, "--start_epoch", "2", "--nEpochs", "1",
              "--val_folder", str(tmp_path / "v2")]
    r2 = subprocess.run(
        [sys.executable, os.path.join(REPO, "cli", "train.py"), *resume],
        cwd=tmp_path, capture_output=True, text=True, env=_env(), timeout=900,
    )
    assert r2.returncode == 0, r2.stdout + r2.stderr
    assert "resumed from orbax step 2" in r2.stdout
    steps = sorted(int(d.name) for d in ck_dir.iterdir() if d.name.isdigit())
    assert steps == [1, 2, 3], steps
