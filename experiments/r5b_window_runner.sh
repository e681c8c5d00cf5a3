#!/bin/bash
# Round-5 chip program, part B: the A/Bs the first window didn't cover.
# Same serialized/resumable structure as r5_window_runner.sh.
cd /root/repo || exit 1
OUT=results/r5_window
mkdir -p "$OUT"
L=$OUT/window_b.log
export HVI_COMPILE_CACHE=/tmp/hvi_cache
export BENCH_ATTEMPT_TIMEOUT=420 BENCH_RETRY_SECONDS=1800

run() {
  local name=$1 tmo=$2; shift 2
  [ -f "$OUT/$name.done" ] && return
  echo "=== $name $(date -u +%H:%M:%S) ===" >> "$L"
  timeout "$tmo" "$@" > "$OUT/$name.out" 2> "$OUT/$name.err"
  local rc=$?
  echo "--- rc=$rc $name $(date -u +%H:%M:%S)" >> "$L"
  [ "$rc" -eq 0 ] && touch "$OUT/$name.done"
}

# LN-stats-on-MXU verdict (queued since round 3; VERDICT r4 #2)
run ln_stats      2000 env LN_STATS_CONV=1 python bench.py
run ln_stats_ncb  2000 env LN_STATS_CONV=1 ATTN_NCB_FEED=1 python bench.py
echo "DONE-B $(date -u +%H:%M:%S)" >> "$L"
# appended: upsample-fold lever (trace-time 1x1-into-3x3 composition)
run fold_up       2000 env UPSAMPLE_FOLD=1 python bench.py
run fold_up_ncb   2000 env UPSAMPLE_FOLD=1 ATTN_NCB_FEED=1 python bench.py
echo "DONE-B2 $(date -u +%H:%M:%S)" >> "$L"
