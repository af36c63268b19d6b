#!/bin/bash
# Round-3 TPU queue B: resume of tpu_queue_r3a after the r3a runner died with
# its session (baseline + MDT_TEMB already measured: 1.9088-1.9120 / 1.9109 =
# NEUTRAL). Remaining steps in value order. One process holds the chip ->
# strictly sequential. Launch DETACHED (setsid) so a dying builder session
# cannot kill it:
#   setsid nohup bash scripts/tpu_queue_r3b.sh >/tmp/tpu_queue_r3b_runner.log 2>&1 &
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/minddiffusion_jax_cache
LOG=/tmp/tpu_queue_r3b.log
: > "$LOG"
echo "=== tpu_queue_r3b start $(date -u +%FT%TZ) pid $$ ===" | tee -a "$LOG"
echo $$ > /tmp/tpu_queue_r3b.pid

run() {
  echo "--- $* ($(date -u +%T)) ---" | tee -a "$LOG"
  timeout 3600 "$@" 2>&1 | tail -60 | tee -a "$LOG"
}

run python benchmarks/bench_train_step.py lora 8
run python benchmarks/bench_train_step.py full 2
run python benchmarks/bench_train_step.py full 8
run python benchmarks/bench_flags.py
run python benchmarks/bench_flags.py x8_conv lp_llo copy_elision copy_region licm2 cond_motion
run python benchmarks/profile_sd2.py 50
run python benchmarks/op_table.py /tmp/sd2_op_profile.json
run python benchmarks/bench_all.py sd2_768 glide_cascade

echo "=== tpu_queue_r3b done $(date -u +%FT%TZ) ===" | tee -a "$LOG"
