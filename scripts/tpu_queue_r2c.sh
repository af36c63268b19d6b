#!/bin/bash
# Round-2 continuation TPU queue: re-pin baseline, retest ds1-winograd with
# the DMA-halo kernel, XLA compiler-flag sweep, fresh op profile.
# Run from /root/repo with the axon TPU platform. One process holds the chip,
# so everything is sequential in this one script.
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/minddiffusion_jax_cache
LOG=/tmp/tpu_queue_r2c.log
: > "$LOG"   # truncate: queue 2 greps this log for the done marker; a stale
             # marker from a previous run must not start it early
echo "=== tpu_queue_r2c start $(date -u +%FT%TZ) ===" | tee -a "$LOG"

run() {
  echo "--- $* ($(date -u +%T)) ---" | tee -a "$LOG"
  timeout 3000 "$@" 2>&1 | tail -40 | tee -a "$LOG"
}

# 1. baseline re-pin (current shipped config)
run python benchmarks/bench_e2e_quick.py baseline_repin

# 2. ds1-winograd re-test: the 64²x320 rejection predates the no-xs + DMA-halo
#    kernel; widen the gate and A/B
run env MDT_WINO_HMAX=64 MDT_WINO_CMIN=320 \
  python benchmarks/bench_e2e_quick.py wino_ds1

# 3. XLA compiler-option sweep, wave 1
run python benchmarks/bench_flags.py

# 4. wave 2 flags
run python benchmarks/bench_flags.py x8_conv lp_llo copy_elision copy_region licm2 cond_motion

# 5. fresh 50-step op profile
run python benchmarks/profile_sd2.py 50
run python benchmarks/op_table.py /tmp/sd2_op_profile.json

echo "=== tpu_queue_r2c done $(date -u +%FT%TZ) ===" | tee -a "$LOG"
