#!/usr/bin/env python
"""Driver benchmark: 600x400 bf16 CIDNet inference throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the north-star target of 1,500 600x400 images/sec bf16 on a single
TPU v5e chip (BASELINE.json; the reference publishes no throughput numbers).

Resilience contract (VERDICT r3 #2): the tunneled TPU backend is flaky —
round 3's driver run died with "Unable to initialize backend 'axon'" and the
round shipped without a headline number.  The measurement therefore runs in a
child subprocess (a failed backend init cannot poison cached state in a fresh
process) under a bounded retry loop with exponential backoff; on final
failure the parent still emits a structured ``{"error": ...}`` JSON line
instead of a bare traceback.

Env knobs:
  BENCH_BATCH / BENCH_ITERS       measurement geometry (default 128 / 8)
  BENCH_RETRY_SECONDS             total retry budget (default 1800)
  BENCH_ATTEMPT_TIMEOUT           per-attempt wall limit (default 600)
  BENCH_STARTUP_TIMEOUT           kill a child with NO output yet (default 180)
  BENCH_IDLE_TIMEOUT              kill a child whose output STOPPED (default 300)
  BENCH_HEARTBEAT                 child liveness-line interval (default 45)
  BENCH_BASE_DELAY                first retry backoff (default 5)
  HVI_COMPILE_CACHE               persistent XLA compile cache dir (shared
                                  across retries: an attempt that dies after
                                  compiling leaves the next one a cache hit)

Idle-watchdog semantics: the child emits a liveness heartbeat every
$BENCH_HEARTBEAT seconds from a daemon thread, so a *healthy but slow*
phase (the first big-program compile through the remote tunnel can exceed
5 minutes) never trips the idle watchdog — observed live this round: the
watchdog killed a child 240 s into a legitimate compile.  The watchdog now
fires only when the child is wedged so hard the heartbeat thread cannot
run (interpreter-level hang, GIL held by a dead device call); a live but
stuck device call keeps heartbeating and is bounded by the attempt
timeout instead.

The attempt timeout must be SMALLER than the retry budget: the worst tunnel
failure mode is a child that prints the axon platform warning (so the startup
watchdog passes) and then hangs in the first device computation — it burns
the full attempt timeout, and with timeout > budget one hang would exhaust
the budget with zero retries (the round-3 arithmetic).  600 s comfortably
covers a healthy run (compile 20-40 s + tunnel overhead); 1800 s of budget
buys three hung attempts' worth of retries.
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

TARGET = 1500.0  # img/s, driver-set north star
H, W = 400, 600  # LOL eval images are 600x400 (WxH); both already x8-divisible

# Failure signatures worth retrying: transient backend/tunnel outages.  A
# genuine code bug (ImportError, shape error, ...) — or a deterministic
# RESOURCE_EXHAUSTED from an oversized BENCH_BATCH (an HBM OOM repeats
# identically every attempt) — fails fast instead of burning the budget.
RETRYABLE = re.compile(
    r"(?i)unable to initialize backend|unavailable|deadline[_ ]exceeded"
    r"|connection (refused|reset|aborted|failed)|connect failed|socket"
    r"|tunnel|timed?[ _]?out|backend setup|heartbeat|rpc (error|failed)"
)


def start_heartbeat(phase: dict) -> None:
    """Liveness heartbeat for measurement children (daemon thread).

    Prints ``bench: alive t=..s phase=..`` to stderr every $BENCH_HEARTBEAT
    (default 45 s) so the parent's idle watchdog distinguishes a slow-but-
    healthy phase (long tunnel compile) from a wedged interpreter.  Callers
    mutate ``phase["name"]`` at each phase transition so a hung attempt's
    last heartbeat names where it died.
    """
    import threading

    interval = float(os.environ.get("BENCH_HEARTBEAT", "45"))
    # clamp below the parent's idle watchdog: a heartbeat interval at or
    # above BENCH_IDLE_TIMEOUT would get healthy children killed by the very
    # watchdog the heartbeat exists to appease (ADVICE r4).  With heartbeats
    # on, the idle watchdog only catches interpreter-level wedges; a hung
    # device call is bounded by BENCH_ATTEMPT_TIMEOUT.
    interval = min(interval, float(os.environ.get("BENCH_IDLE_TIMEOUT", "300")) / 2)
    t0 = time.monotonic()

    def beat():
        while True:
            time.sleep(interval)
            print(
                f"bench: alive t={time.monotonic() - t0:.0f}s phase={phase['name']}",
                file=sys.stderr,
                flush=True,
            )

    threading.Thread(target=beat, daemon=True).start()


def measure() -> dict:
    """The actual single-chip measurement (runs in the child process)."""
    phase = {"name": "backend-init"}
    start_heartbeat(phase)

    import numpy as np
    import jax
    import jax.numpy as jnp

    from hvi_cidnet_tpu.models.cidnet import CIDNetConfig, cidnet_forward, init_cidnet
    from hvi_cidnet_tpu.utils.compile_cache import enable_compilation_cache

    cache = enable_compilation_cache()
    if cache:
        print(f"bench: compile cache at {cache}", file=sys.stderr, flush=True)

    # batch 128 ~doubles throughput vs 32 (per-op overheads amortize);
    # 192+ exceeds the 16 GB HBM at 600x400.
    batch = int(os.environ.get("BENCH_BATCH", "128"))
    iters = int(os.environ.get("BENCH_ITERS", "8"))
    # BENCH_INPUT_LAYOUT=hwcb: the serving contract where the host pipeline
    # packs batches straight into the model's internal (H,W,3,B) layout —
    # the device program then contains no NHWC boundary relayouts (the
    # round-3 profile attributed ~40 ms/fwd to NHWC packing alone)
    layout = os.environ.get("BENCH_INPUT_LAYOUT", "nhwc")
    # stderr breadcrumbs: a hung attempt gets killed by the parent's timeout,
    # and the last line tells which phase (device claim / compile / measure)
    # the tunnel died in.
    print(f"bench: devices {jax.devices()}", file=sys.stderr, flush=True)
    cfg = CIDNetConfig(variant="base")
    params = init_cidnet(jax.random.PRNGKey(0), cfg)
    params = {k: (v.astype(jnp.bfloat16) if v.ndim == 4 else v) for k, v in params.items()}
    shape = (batch, H, W, 3) if layout == "nhwc" else (H, W, 3, batch)
    x = jnp.asarray(np.random.default_rng(0).uniform(0, 1, shape), jnp.bfloat16)

    def one(p, x):
        out = cidnet_forward(
            p, x, cfg, compute_dtype=jnp.bfloat16, input_layout=layout
        )
        return jnp.clip(out, 0, 1)

    # Sustained-throughput methodology: iterate INSIDE one jit program via
    # scan (chained so iterations can't collapse), because (a) the remote-TPU
    # tunnel adds multi-ms fixed overhead per dispatched program, which a
    # local deployment doesn't pay, and (b) ``block_until_ready`` through the
    # tunnel can return early — the scalar host fetch below is the only
    # reliable completion barrier.
    @jax.jit
    def loop(p, x):
        def body(carry, _):
            y = one(p, x + carry * jnp.bfloat16(1e-6))
            return jnp.mean(y).astype(jnp.bfloat16), None
        final, _ = jax.lax.scan(body, jnp.bfloat16(0.0), None, length=iters)
        return final

    phase["name"] = "compile+warmup"
    print("bench: compiling + warmup", file=sys.stderr, flush=True)
    _ = float(loop(params, x))  # compile + warmup
    phase["name"] = "measure"
    print("bench: measuring", file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    _ = float(loop(params, x))
    dt = (time.perf_counter() - t0) / iters
    throughput = batch / dt

    tag = "" if layout == "nhwc" else f", {layout} input"
    return {
        "metric": f"600x400 images/sec/chip (bf16 CIDNet inference{tag})",
        "value": round(throughput, 2),
        "unit": "img/s",
        "vs_baseline": round(throughput / TARGET, 4),
    }


def _selftest_once() -> int:
    """Simulated-outage mode for the retry-path test (no jax import).

    With BENCH_SELFTEST_FAILS=N and BENCH_SELFTEST_STATE=<counter file>, the
    first N child attempts die with the round-3 backend-outage signature;
    subsequent attempts succeed with a marker result.
    """
    fails = int(os.environ["BENCH_SELFTEST_FAILS"])
    state = os.environ["BENCH_SELFTEST_STATE"]
    n = 0
    if os.path.exists(state):
        with open(state) as f:
            n = int(f.read().strip() or 0)
    with open(state, "w") as f:
        f.write(str(n + 1))
    if n < fails:
        print(
            "RuntimeError: Unable to initialize backend 'axon': UNAVAILABLE: "
            "TPU backend setup/compile error (Unavailable).",
            file=sys.stderr,
        )
        return 1
    print(json.dumps({"metric": "selftest", "value": 1.0, "unit": "ok", "vs_baseline": 1.0}))
    return 0


def extract_result(stdout: str) -> dict | None:
    """Last stdout line that parses as a JSON object with a 'metric' key."""
    for line in reversed(stdout.strip().splitlines()):
        line = line.strip()
        if not line.startswith("{"):
            continue
        try:
            obj = json.loads(line)
        except ValueError:
            continue
        if isinstance(obj, dict) and "metric" in obj:
            return obj
    return None


def run_attempt(timeout: float, *, script: str = None, extra: list = None) -> tuple[int, str, str]:
    """One measurement attempt in a fresh interpreter.

    ``script``/``extra`` let siblings (bench_extra.py) reuse the same
    subprocess/timeout handling for their own child modes.

    Startup watchdog: the tunnel's sitecustomize hook dials the TPU during
    *interpreter startup*; when the tunnel flaps, the child blocks before
    executing a single line — no output, no progress, and a full ``timeout``
    (default 900 s) burned against a 600 s retry budget, i.e. zero retries.
    A healthy child emits its first stderr line (the axon platform warning)
    within seconds, so: no bytes on either stream within
    $BENCH_STARTUP_TIMEOUT (default 180 s) -> kill and report a retryable
    startup hang.

    Idle watchdog: the OTHER observed outage mode (the day-long round-4
    outage) passes the startup check — the axon warning prints, then the
    first device operation hangs forever.  The child emits phase breadcrumbs
    (devices / compiling / measuring), and a healthy gap between them is
    under ~60 s even with TPU compile, so: no NEW bytes on either stream
    within $BENCH_IDLE_TIMEOUT (default 300 s) -> kill and report a
    retryable device hang.  That turns a hung attempt from ``timeout`` s
    into ~300 s, roughly doubling the retries a fixed budget buys.
    """
    import threading

    argv = [sys.executable, script or os.path.abspath(__file__), "--once"] + (extra or [])
    startup = float(os.environ.get("BENCH_STARTUP_TIMEOUT", "180"))
    idle_limit = float(os.environ.get("BENCH_IDLE_TIMEOUT", "300"))
    proc = subprocess.Popen(
        argv, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True
    )
    first_output = threading.Event()
    chunks = {"out": [], "err": []}
    last_output = [time.monotonic()]

    def pump(stream, key):
        while True:
            ch = stream.read(1)
            if not ch:
                break
            first_output.set()
            last_output[0] = time.monotonic()
            chunks[key].append(ch)

    readers = [
        threading.Thread(target=pump, args=(proc.stdout, "out"), daemon=True),
        threading.Thread(target=pump, args=(proc.stderr, "err"), daemon=True),
    ]
    for t in readers:
        t.start()

    def finish(rc, extra_err=""):
        for t in readers:
            t.join(timeout=10)
        return rc, "".join(chunks["out"]), "".join(chunks["err"]) + extra_err

    if not first_output.wait(startup):
        proc.kill()
        proc.wait()
        return finish(
            -1,
            f"\nstartup hang: no output within {startup:.0f}s "
            "(interpreter blocked in the tunnel's sitecustomize hook)",
        )
    deadline = time.monotonic() + timeout
    while True:
        try:
            rc = proc.wait(timeout=min(5.0, max(deadline - time.monotonic(), 0.1)))
            return finish(rc)
        except subprocess.TimeoutExpired:
            now = time.monotonic()
            idle = now - last_output[0]
            if idle > idle_limit:
                proc.kill()
                proc.wait()
                return finish(
                    -1,
                    f"\ndevice hang: no new output for {idle:.0f}s "
                    "(child stalled in a device operation; tunnel down)",
                )
            if now >= deadline:
                proc.kill()
                proc.wait()
                return finish(-1, f"\nattempt timed out after {timeout:.0f}s")


METRIC = "600x400 images/sec/chip (bf16 CIDNet inference)"


def retry_loop(
    attempt,
    budget: float,
    *,
    base_delay: float = 5.0,
    max_delay: float = 60.0,
    metric: str = METRIC,
):
    """Bounded-retry driver around ``attempt() -> (rc, stdout, stderr)``.

    Returns the success result dict, or raises SystemExit after printing a
    structured error line labeled with ``metric`` (callers measuring other
    graphs pass their own label so failures aren't misattributed).
    Separated from main() so the outage test can drive it with an injected
    attempt function too.
    """
    deadline = time.monotonic() + budget
    delay = base_delay
    attempts = 0
    last_err = ""
    while True:
        attempts += 1
        rc, out, err = attempt()
        result = extract_result(out)
        if rc == 0 and result is not None:
            if attempts > 1:
                print(f"bench: succeeded on attempt {attempts}", file=sys.stderr)
            return result
        tail = "\n".join((err or out).strip().splitlines()[-30:])
        last_err = tail
        remaining = deadline - time.monotonic()
        retryable = rc == -1 or bool(RETRYABLE.search(tail))
        if not retryable or remaining <= 0:
            why = "non-retryable failure" if not retryable else "retry budget exhausted"
            print(
                f"bench: giving up after {attempts} attempt(s): {why}", file=sys.stderr
            )
            print(
                json.dumps(
                    {
                        "metric": metric,
                        "error": last_err[-2000:],
                        "attempts": attempts,
                        "retryable": retryable,
                    }
                )
            )
            raise SystemExit(1)
        wait = min(delay, max(remaining, 1.0))
        print(
            f"bench: attempt {attempts} failed (transient backend error); "
            f"retrying in {wait:.0f}s ({remaining:.0f}s budget left)\n"
            f"  last error: {tail.splitlines()[-1] if tail else '?'}",
            file=sys.stderr,
        )
        time.sleep(wait)
        delay = min(delay * 2, max_delay)


def main() -> None:
    if "--once" in sys.argv:
        if os.environ.get("BENCH_SELFTEST_FAILS"):
            raise SystemExit(_selftest_once())
        print(json.dumps(measure()))
        return
    budget = float(os.environ.get("BENCH_RETRY_SECONDS", "1800"))
    timeout = float(os.environ.get("BENCH_ATTEMPT_TIMEOUT", "600"))
    base_delay = float(os.environ.get("BENCH_BASE_DELAY", "5"))
    result = retry_loop(lambda: run_attempt(timeout), budget, base_delay=base_delay)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
