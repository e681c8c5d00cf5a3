#!/bin/bash
# Round-4 session-4 chip-window runner (v2).
#
# v1 lesson (observed live 04:21-04:33 UTC): the tunnel came up, the bench
# child reached "compiling + warmup", and the idle watchdog killed it 240 s
# into a legitimately slow remote compile.  v2 changes:
#   - bench children now emit liveness heartbeats (bench.start_heartbeat),
#     so the idle watchdog only fires on truly wedged interpreters;
#   - a persistent XLA compile cache is shared across attempts — an attempt
#     that dies after compiling leaves the next one a cache hit;
#   - the ledger is RESUMABLE (per-step done markers) and re-probes the
#     tunnel before every step, so a mid-ledger flap parks instead of
#     burning every remaining step's timeout;
#   - commits land after each major artifact, not only at the end.
#
# Priority order: headline bench first, then the variant/train artifact
# (BENCH_extra.json), then the seam A/Bs and attribution probes.

set -u
cd /root/repo
LOG=results/r4_window
MARK=$LOG/done
mkdir -p "$LOG" "$MARK"

export HVI_COMPILE_CACHE=/root/repo/.xla_cache
export BENCH_HEARTBEAT=45 BENCH_STARTUP_TIMEOUT=120 BENCH_IDLE_TIMEOUT=180
export BENCH_RETRY_SECONDS=1200 BENCH_ATTEMPT_TIMEOUT=720

WAIT_BUDGET=${WAIT_BUDGET:-2700}

probe() {
  timeout 180 python -c '
import jax, jax.numpy as jnp
x = jnp.ones((256, 256))
(x @ x).block_until_ready()
print("probe-ok", jax.devices())
' >>"$LOG/probes_s4.log" 2>&1
}

wait_up() {
  local start now n=0
  start=$(date +%s)
  while true; do
    n=$((n + 1))
    echo "=== s4 probe $(date -u +%H:%M:%S) ===" >>"$LOG/probes_s4.log"
    if probe; then return 0; fi
    now=$(date +%s)
    if [ $((now - start)) -ge "$WAIT_BUDGET" ]; then
      echo "s4 runner: tunnel stayed down for ${WAIT_BUDGET}s; parking" \
        | tee -a "$LOG/probes_s4.log"
      return 1
    fi
    sleep 120
  done
}

commit_artifacts() {
  # add each pathspec separately: a single 'git add a b' aborts ENTIRELY when
  # any one pathspec is unmatched (e.g. BENCH_extra.json before bench_extra
  # succeeds), silently staging nothing (ADVICE r4).  Return git's commit rc
  # so callers only touch their done-markers when a commit actually landed.
  local p
  for p in results/r4_window BENCH_extra.json BENCH_r*.json MULTICHIP_r*.json; do
    git add "$p" 2>>"$LOG/window.log" || true
  done
  git commit -q -m "$1" 2>>"$LOG/window.log"
}

step() {
  local name=$1 tmo=$2
  shift 2
  [ -f "$MARK/$name" ] && return 0
  wait_up || return 1
  echo "=== $name $(date -u +%H:%M:%S) ===" >>"$LOG/window.log"
  timeout "$tmo" "$@" >>"$LOG/window.log" 2>&1
  local rc=$?
  echo "--- rc=$rc $name $(date -u +%H:%M:%S)" >>"$LOG/window.log"
  [ "$rc" -eq 0 ] && touch "$MARK/$name"
  return 0
}

ledger_pass() {
  step bench_headline 2000 python bench.py || return 1
  [ -f "$MARK/bench_headline" ] && [ ! -f "$MARK/.c1" ] \
    && commit_artifacts "Chip window: round-4 headline bench" && touch "$MARK/.c1"
  step bench_extra 2700 env BENCH_RETRY_SECONDS=600 BENCH_ATTEMPT_TIMEOUT=540 \
    python bench_extra.py || return 1
  [ -f "$MARK/bench_extra" ] && [ ! -f "$MARK/.c2" ] \
    && commit_artifacts "Chip window: variant/train bench artifact (BENCH_extra.json)" \
    && touch "$MARK/.c2"
  step bench_ln_stats_conv 2000 env LN_STATS_CONV=1 python bench.py || return 1
  step bench_base_repeat 2000 python bench.py || return 1
  step attn_train_feed 1200 python -u experiments/attn_train_feed_r4.py || return 1
  step train_bench 900 python -u experiments/train_bench_r3.py || return 1
  step train_bench_ncb 900 env ATTN_NCB_FEED=1 python -u experiments/train_bench_r3.py || return 1
  step bench_ncb_serving 2000 env ATTN_NCB_FEED=1 python bench.py || return 1
  step ln_stats_micro 900 python -u experiments/ln_stats_mxu_r3.py || return 1
  step profile_serving 1200 python -u experiments/profile_serving_r3.py hwcb || return 1
  step pool_attrib 1200 python -u experiments/pool_attrib_r4.py || return 1
  cp -f /tmp/pool_attrib_r4.txt "$LOG/" 2>/dev/null
  return 0
}

# two passes: a step that failed non-retryably gets exactly one more try
ledger_pass
ledger_pass
echo "s4 runner: ledger finished $(date -u +%H:%M:%S)" >>"$LOG/window.log"
commit_artifacts "Chip window ledger: round-4 session-4 measurements"
echo "s4 runner: done"
