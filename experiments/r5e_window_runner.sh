#!/bin/bash
# Round-5 chip program, part E: post-HWB-flip refresh.
#  - headline at the final default stack (ncb feed + upsample fold + HWB order)
#  - BENCH_extra refresh so the committed artifact reflects the defaults
#  - residual pool attribution + XLA cost analysis of the new schedule
# Resumable: .done markers skip completed jobs on relaunch.
cd /root/repo || exit 1
OUT=results/r5_window
mkdir -p "$OUT"
L=$OUT/window_e.log
export HVI_COMPILE_CACHE=/tmp/hvi_cache
export BENCH_ATTEMPT_TIMEOUT=420 BENCH_RETRY_SECONDS=1800

probe() {
  timeout 90 python -c "
import jax, jax.numpy as jnp
print(jnp.ones((8,128)).sum())" > /dev/null 2>&1
}

echo "PROBE-START $(date -u +%H:%M:%S)" >> "$L"
until probe; do
  echo "probe down $(date -u +%H:%M:%S)" >> "$L"
  sleep 120
done
echo "TUNNEL-UP $(date -u +%H:%M:%S)" >> "$L"

run() {
  local name=$1 tmo=$2; shift 2
  [ -f "$OUT/$name.done" ] && return
  echo "=== $name $(date -u +%H:%M:%S) ===" >> "$L"
  timeout "$tmo" "$@" > "$OUT/$name.out" 2> "$OUT/$name.err"
  local rc=$?
  echo "--- rc=$rc $name $(date -u +%H:%M:%S)" >> "$L"
  [ "$rc" -eq 0 ] && touch "$OUT/$name.done"
}

# 1. headline at the final defaults (expect ~274 per window D's hwb_order arm)
run headline_r5e    2000 python bench.py
# 2. variant/train/full-res refresh -> rewrites BENCH_extra.json
run bench_extra_r5e 2800 python bench_extra.py
# 3. residual-pool attribution on the post-HWB program
run pool_attrib_r5e 1200 python experiments/pool_attrib_r4.py
# 4. XLA cost analysis: fold + HWB order cut the 294 GB/fwd schedule
run ceiling_bytes_r5e 1200 python experiments/ceiling_bytes_r3.py
echo "DONE-E $(date -u +%H:%M:%S)" >> "$L"
