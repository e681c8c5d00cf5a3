#!/bin/bash
# Round-5 chip window program.  One chip, strictly serialized jobs (two
# processes cannot share it — the second gets FAILED_PRECONDITION).
#
# Resumable: each job leaves a $OUT/<name>.done marker on rc=0 and is
# skipped on re-run, so a killed runner (session death, tunnel outage)
# restarts where it left off.  Retry arithmetic per docs/ROUND4_NOTES:
# healthy cached attempt ~3 min, so BENCH_ATTEMPT_TIMEOUT=420 buys ~4
# attempts inside the 1800 s budget; the outer step timeout (2000 s)
# exceeds budget+slack so the inner retry loop, not `timeout`, decides.
cd /root/repo || exit 1
OUT=results/r5_window
mkdir -p "$OUT"
L=$OUT/window.log
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

# A: headline repeats (window comparability + the NCB win)
run base_repeat   2000 python bench.py
run ncb_repeat    2000 env ATTN_NCB_FEED=1 python bench.py
# B: host-layout serving arms (VERDICT #7: HWCB input end-to-end)
run hwcb_input    2000 env BENCH_INPUT_LAYOUT=hwcb python bench.py
run ncb_hwcb      2000 env ATTN_NCB_FEED=1 BENCH_INPUT_LAYOUT=hwcb python bench.py
# C: BENCH_extra.json (VERDICT #3 + #8): mssa/tnsm/train + full-res arms
BENCH_RETRY_SECONDS=600 run bench_extra 7200 python bench_extra.py
# D: train-geometry program (VERDICT #4)
run train_base      2000 python -u experiments/train_bench_r3.py
run train_ncb       2000 env ATTN_NCB_FEED=1 python -u experiments/train_bench_r3.py
run attn_train_feed 2400 python -u experiments/attn_train_feed_r4.py
# E: per-site pool attribution (VERDICT #2) + batch sweep (VERDICT #7)
run pool_attrib   2000 python -u experiments/pool_attrib_r4.py
run batch96       2000 env BENCH_BATCH=96  python bench.py
run batch160      2000 env BENCH_BATCH=160 python bench.py
echo "DONE $(date -u +%H:%M:%S)" >> "$L"
