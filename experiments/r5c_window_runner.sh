#!/bin/bash
# Round-5 chip program, part C: post-default-flip refresh + DUS hunt.
# Waits for the tunnel (probe loop), then runs the serialized program.
# Resumable: .done markers skip completed jobs on relaunch.
cd /root/repo || exit 1
OUT=results/r5_window
mkdir -p "$OUT"
L=$OUT/window_c.log
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

# 1. headline with the flipped defaults (fold + ncb) — the BENCH_r05 arm
run headline_defaults 2000 python bench.py
# 2. variant/train/full-res refresh with the new defaults
run bench_extra_r5c   2400 python bench_extra.py
# 3. name the ~18 ms dynamic-update-slice pool (needs TPU compile)
run dus_hunt          1200 python experiments/dus_hunt_r5.py
# 4. fresh residual-pool attribution on the post-fold program
run pool_attrib_r5c   1200 env ATTN_NCB_FEED=1 UPSAMPLE_FOLD=1 python experiments/pool_attrib_r4.py
# 5. re-run the XLA cost analysis: the fold cut the 294 GB/fwd schedule
run ceiling_bytes_r5c 1200 python experiments/ceiling_bytes_r3.py
echo "DONE-C $(date -u +%H:%M:%S)" >> "$L"
