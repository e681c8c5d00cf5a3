#!/bin/bash
# Round-5 chip program, part D: HVI boundary-transpose levers.
#  - HVI_HWB_ORDER=1: HWB plane pixel order (one lane crossing per
#    transform instead of two) on the NHWC headline arm
#  - hwcb serving arm, now with the zero-crossing Pallas hwcb-io kernels
cd /root/repo || exit 1
OUT=results/r5_window
mkdir -p "$OUT"
L=$OUT/window_d.log
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

run hwb_order       2000 env HVI_HWB_ORDER=1 python bench.py
run hwcb_pallas_io  2000 env BENCH_INPUT_LAYOUT=hwcb python bench.py
# DUS pool size under the winning arm (compare dus_hunt.out)
run dus_hunt_hwb    1200 env HVI_HWB_ORDER=1 DUS_HLO_OUT=/tmp/bench_hlo_r5_hwb.txt python experiments/dus_hunt_r5.py
echo "DONE-D $(date -u +%H:%M:%S)" >> "$L"
