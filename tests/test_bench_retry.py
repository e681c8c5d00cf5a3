"""bench.py resilience: the retry loop must survive a simulated backend outage.

Round 3 lost its headline metric to a transient "Unable to initialize backend
'axon'" (BENCH_r03.json rc=1).  These tests drive bench.py's retry machinery
both in-process (injected attempt fn) and end-to-end as a subprocess with the
real child-spawning path, using BENCH_SELFTEST_FAILS to simulate the outage
without touching jax.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench


def test_extract_result_picks_last_metric_line():
    out = (
        "some log noise\n"
        '{"not_a_metric": 1}\n'
        '{"metric": "m", "value": 2.0, "unit": "img/s", "vs_baseline": 0.1}\n'
    )
    assert bench.extract_result(out)["value"] == 2.0
    assert bench.extract_result("no json here") is None


def test_retry_loop_recovers_after_transient_failures():
    calls = {"n": 0}

    def attempt():
        calls["n"] += 1
        if calls["n"] <= 2:
            return 1, "", "RuntimeError: Unable to initialize backend 'axon': UNAVAILABLE"
        return 0, json.dumps({"metric": "m", "value": 7.0}), ""

    result = bench.retry_loop(attempt, budget=30.0, base_delay=0.01, max_delay=0.02)
    assert result["value"] == 7.0
    assert calls["n"] == 3


def test_retry_loop_fails_fast_on_non_retryable_error(capsys):
    def attempt():
        return 1, "", "ImportError: No module named 'nonsense'"

    with pytest.raises(SystemExit):
        bench.retry_loop(attempt, budget=30.0, base_delay=0.01)
    line = [l for l in capsys.readouterr().out.splitlines() if l.startswith("{")][-1]
    err = json.loads(line)
    assert err["attempts"] == 1 and err["retryable"] is False
    assert "ImportError" in err["error"]


def test_retry_loop_emits_structured_error_when_budget_exhausted(capsys):
    def attempt():
        return 1, "", "UNAVAILABLE: TPU backend setup/compile error"

    with pytest.raises(SystemExit):
        bench.retry_loop(attempt, budget=0.05, base_delay=0.01)
    line = [l for l in capsys.readouterr().out.splitlines() if l.startswith("{")][-1]
    err = json.loads(line)
    assert err["retryable"] is True and "UNAVAILABLE" in err["error"]


def test_bench_subprocess_simulated_outage(tmp_path):
    """End-to-end: real parent + real child processes, 2 simulated outages."""
    state = tmp_path / "counter"
    env = dict(
        os.environ,
        BENCH_SELFTEST_FAILS="2",
        BENCH_SELFTEST_STATE=str(state),
        BENCH_RETRY_SECONDS="60",
        BENCH_ATTEMPT_TIMEOUT="30",
        BENCH_BASE_DELAY="0.1",
    )
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True,
        text=True,
        env=env,
        timeout=120,
    )
    assert proc.returncode == 0, proc.stderr
    result = bench.extract_result(proc.stdout)
    assert result is not None and result["metric"] == "selftest"
    assert state.read_text().strip() == "3"  # 2 failures + 1 success
    assert "retrying" in proc.stderr


def test_run_attempt_kills_silent_startup_hang(tmp_path, monkeypatch):
    """A child blocked in the tunnel's sitecustomize hook produces no output
    at all; the watchdog must kill it after BENCH_STARTUP_TIMEOUT (retryable)
    instead of burning the whole attempt timeout."""
    import time

    hang = tmp_path / "hang.py"
    hang.write_text("import time\ntime.sleep(60)\n")
    monkeypatch.setenv("BENCH_STARTUP_TIMEOUT", "1")
    t0 = time.monotonic()
    rc, out, err = bench.run_attempt(30.0, script=str(hang))
    assert rc == -1
    assert "startup hang" in err
    assert time.monotonic() - t0 < 15
    # the watchdog's signature must be retryable so the loop tries again
    assert bench.RETRYABLE.search(err)


def test_run_attempt_kills_idle_device_hang(tmp_path, monkeypatch):
    """The round-4 outage mode: the child prints the platform warning (so
    the startup watchdog passes) and then hangs forever in the first device
    op.  The idle watchdog must kill it after BENCH_IDLE_TIMEOUT of output
    silence (retryable) instead of burning the whole attempt timeout."""
    import time

    hang = tmp_path / "hang_after_output.py"
    hang.write_text(
        "import sys, time\n"
        "print('Platform axon is experimental', file=sys.stderr, flush=True)\n"
        "time.sleep(120)\n"
    )
    monkeypatch.setenv("BENCH_STARTUP_TIMEOUT", "20")
    monkeypatch.setenv("BENCH_IDLE_TIMEOUT", "2")
    t0 = time.monotonic()
    rc, out, err = bench.run_attempt(60.0, script=str(hang))
    assert rc == -1
    assert "device hang" in err
    assert time.monotonic() - t0 < 30
    assert bench.RETRYABLE.search(err)


def test_run_attempt_passes_healthy_child(tmp_path, monkeypatch):
    ok = tmp_path / "ok.py"
    ok.write_text(
        "import json, sys\n"
        "print(json.dumps({'metric': 'm', 'value': 3.0}))\n"
        "print('warming', file=sys.stderr)\n"
    )
    monkeypatch.setenv("BENCH_STARTUP_TIMEOUT", "30")
    rc, out, err = bench.run_attempt(30.0, script=str(ok))
    assert rc == 0
    assert bench.extract_result(out)["value"] == 3.0


def test_bench_extra_parent_writes_artifact(tmp_path, monkeypatch):
    """bench_extra.py must emit one JSON line per graph (base/mssa/tnsm/
    train) and persist them to BENCH_extra.json (VERDICT r3 weak #6) —
    measurement stubbed, plumbing real."""
    import bench_extra

    def fake_child(graph, timeout):
        return 0, json.dumps(
            {"metric": f"g:{graph}", "value": 1.0, "unit": "img/s", "vs_baseline": 0.1}
        ), ""

    monkeypatch.setattr(bench_extra, "run_child", fake_child)
    monkeypatch.setattr(sys, "argv", ["bench_extra.py", "--out", str(tmp_path / "BENCH_extra.json")])
    bench_extra.main()
    lines = (tmp_path / "BENCH_extra.json").read_text().strip().splitlines()
    assert [json.loads(l)["metric"] for l in lines] == [
        "g:base", "g:mssa", "g:tnsm", "g:train", "g:fullres_b1", "g:fullres_b8",
    ]
    for l in lines:
        obj = json.loads(l)
        assert set(obj) == {"metric", "value", "unit", "vs_baseline"}


@pytest.mark.heavy
def test_bench_extra_measure_runs_tiny(monkeypatch):
    """measure() executes for real (tiny CPU geometry) and emits the
    artifact schema — guards the measurement code itself, not just the
    parent plumbing."""
    import importlib

    for k, v in [("BENCH_H", "40"), ("BENCH_W", "48"), ("BENCH_BATCH", "2"),
                 ("BENCH_ITERS", "2"), ("BENCH_TRAIN_CROP", "32"),
                 ("BENCH_TRAIN_BATCH", "2")]:
        monkeypatch.setenv(k, v)
    import bench_extra
    importlib.reload(bench_extra)
    try:
        for graph in ("base", "train"):
            r = bench_extra.measure(graph)
            assert set(r) == {"metric", "value", "unit", "vs_baseline"}
            assert r["value"] > 0
    finally:
        for k in ("BENCH_H", "BENCH_W", "BENCH_BATCH", "BENCH_ITERS",
                  "BENCH_TRAIN_CROP", "BENCH_TRAIN_BATCH"):
            monkeypatch.delenv(k)
        importlib.reload(bench_extra)


def test_bench_extra_survives_one_failed_graph(tmp_path, monkeypatch):
    """A terminally-failing graph must not discard the window's other
    measurements: the artifact still carries every graph (error entry for
    the failed one) and the process exits nonzero."""
    import importlib

    import bench_extra
    importlib.reload(bench_extra)

    def fake_child(graph, timeout):
        if graph == "tnsm":
            return 1, "", "ImportError: broken graph"  # non-retryable
        return 0, json.dumps(
            {"metric": f"g:{graph}", "value": 1.0, "unit": "img/s", "vs_baseline": 0.1}
        ), ""

    monkeypatch.setattr(bench_extra, "run_child", fake_child)
    out = tmp_path / "BENCH_extra.json"
    monkeypatch.setattr(sys, "argv", ["bench_extra.py", "--out", str(out)])
    with pytest.raises(SystemExit):
        bench_extra.main()
    lines = [json.loads(l) for l in out.read_text().strip().splitlines()]
    assert len(lines) == 6
    assert [l["metric"] for l in lines] == [
        "g:base", "g:mssa", "graph:tnsm", "g:train", "g:fullres_b1", "g:fullres_b8",
    ]
    assert "error" in lines[2]
