"""Entry-point multi-host training (VERDICT r3 missing #3 / SURVEY §2.3 item 2).

Launches ``cli/train.py --multihost`` as TWO real OS processes on a CPU
coordinator (4 fake devices each -> one 8-device global mesh) and asserts the
per-epoch losses equal the single-process 8-fake-device run bit-for-bit: the
global mesh shape, batch order, augmentation stream, and shard_map pmean
math are identical — only WHO decodes each row changes.
"""

from __future__ import annotations

import os
import re
import socket
import subprocess
import sys

import pytest

pytestmark = pytest.mark.heavy

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TRAIN_ARGS = [
    "--synthetic_steps", "2", "--nEpochs", "2", "--snapshots", "99",
    "--batchSize", "8", "--cropSize", "32", "--use_perceptual", "false",
    "--lmot", "false", "--variant", "base", "--seed", "7", "--threads", "2",
]


def _env(n_local: int) -> dict:
    env = {k: v for k, v in os.environ.items() if k != "PALLAS_AXON_POOL_IPS"}
    env["JAX_PLATFORMS"] = "cpu"  # effective once the axon backend is not registered
    flags = [f for f in env.get("XLA_FLAGS", "").split() if "host_platform_device_count" not in f]
    env["XLA_FLAGS"] = " ".join(flags + [f"--xla_force_host_platform_device_count={n_local}"])
    return env


def _losses(stdout: str) -> list:
    return [float(m) for m in re.findall(r"Loss: ([0-9.]+)", stdout)]


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _run_single(tmp_path):
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "cli", "train.py"), *TRAIN_ARGS,
         "--val_folder", str(tmp_path / "single")],
        cwd=tmp_path, capture_output=True, text=True, env=_env(8), timeout=900,
    )
    assert r.returncode == 0, r.stdout + r.stderr
    return r


def test_multihost_cli_matches_single_process(tmp_path):
    port = _free_port()
    procs = []
    for pid in range(2):
        procs.append(subprocess.Popen(
            [sys.executable, os.path.join(REPO, "cli", "train.py"), *TRAIN_ARGS,
             "--multihost", "true",
             "--coordinator_address", f"127.0.0.1:{port}",
             "--num_processes", "2", "--process_id", str(pid),
             "--val_folder", str(tmp_path / "multi")],
            cwd=tmp_path, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True, env=_env(4),
        ))
    outs = []
    try:
        for p in procs:
            out, err = p.communicate(timeout=900)
            outs.append((p.returncode, out, err))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for rc, out, err in outs:
        assert rc == 0, out + err

    # process 0 logs; process 1 is silent (primary-only printing)
    multi_losses = _losses(outs[0][1])
    assert len(multi_losses) == 2, outs[0][1] + outs[0][2]
    assert _losses(outs[1][1]) == []
    assert "multihost: 2 processes, 8 global devices" in outs[0][1]

    single = _run_single(tmp_path)
    single_losses = _losses(single.stdout)
    assert len(single_losses) == 2

    # same 8-device global mesh + same seed => identical global batches and
    # pmean math; CPU fp32 makes this bit-reproducible
    assert multi_losses == pytest.approx(single_losses, rel=1e-6, abs=1e-7)

    # only process 0 wrote canaries / the report
    assert os.path.exists(tmp_path / "multi" / "training" / "test.png")


def test_multihost_requires_explicit_seed(tmp_path):
    """Divergent per-process RNG would silently desync the global batch
    order — the CLI must refuse a random seed in a real pod run."""
    port = _free_port()
    args = [a for a in TRAIN_ARGS if a != "--seed"]
    args.remove("7")
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(REPO, "cli", "train.py"), *args,
             "--multihost", "true",
             "--coordinator_address", f"127.0.0.1:{port}",
             "--num_processes", "2", "--process_id", str(pid),
             "--val_folder", str(tmp_path / "m")],
            cwd=tmp_path, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True, env=_env(4),
        )
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, err = p.communicate(timeout=600)
            outs.append((p.returncode, out, err))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for rc, out, err in outs:
        assert rc != 0
        assert "requires an explicit --seed" in err, out + err


def _launch_pod(tmp_path, extra_args, n_proc=2, n_local=4):
    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(REPO, "cli", "train.py"), *extra_args,
             "--multihost", "true",
             "--coordinator_address", f"127.0.0.1:{port}",
             "--num_processes", str(n_proc), "--process_id", str(pid)],
            cwd=tmp_path, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True, env=_env(n_local),
        )
        for pid in range(n_proc)
    ]
    outs = []
    try:
        for p in procs:
            out, err = p.communicate(timeout=900)
            outs.append((p.returncode, out, err))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    return outs


def test_multihost_resume_broadcasts_checkpoint(tmp_path):
    """Resume in a pod must work when only process 0 can read the
    checkpoint: the file is loaded once and broadcast (code-review r4
    finding — per-host disks would otherwise FileNotFoundError or silently
    resume divergent replicas)."""
    args = [a for a in TRAIN_ARGS if True]
    # leg 1: one epoch, checkpoint it (process 0 writes ./weights/train)
    leg1 = [*args]
    leg1[leg1.index("--nEpochs") + 1] = "1"
    leg1[leg1.index("--snapshots") + 1] = "1"
    outs = _launch_pod(tmp_path, [*leg1, "--val_folder", str(tmp_path / "m1")])
    for rc, out, err in outs:
        assert rc == 0, out + err
    ckpt = tmp_path / "weights" / "train" / "epoch_1.npz"
    assert ckpt.exists()

    # leg 2: resume from it in a FRESH pod; hide the file from process 1 by
    # running it in a different cwd (simulates per-host disks)
    resume = [*leg1, "--start_epoch", "1", "--val_folder", str(tmp_path / "m2")]
    port = _free_port()
    cwds = [tmp_path, tmp_path / "host1"]
    os.makedirs(cwds[1], exist_ok=True)
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(REPO, "cli", "train.py"), *resume,
             "--multihost", "true",
             "--coordinator_address", f"127.0.0.1:{port}",
             "--num_processes", "2", "--process_id", str(pid)],
            cwd=cwds[pid], stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True, env=_env(4),
        )
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, err = p.communicate(timeout=900)
            outs.append((p.returncode, out, err))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for rc, out, err in outs:
        assert rc == 0, out + err
    assert "resumed from" in outs[0][1]
    assert len(_losses(outs[0][1])) == 1  # one more epoch ran
