#!/bin/bash
# Round-3 TPU queue A: fire every measurement VERDICT.md flagged as queued-but-
# never-run, in value order. One process holds the chip -> strictly sequential.
#   1. baseline re-pin (compile cached from r2)
#   2. MDT_TEMB e2e A/B (the r2 optimization that shipped dark)
#   3. train-step perf table (lora/full; the reference's only numeric table)
#   4. XLA compiler-option sweep wave 1 + 2 (promote winners to xla_opts.SHIPPED)
#   5. fresh 50-step op profile
#   6. stretch configs: SD2 768^2 + GLIDE cascade
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/minddiffusion_jax_cache
LOG=/tmp/tpu_queue_r3a.log
: > "$LOG"   # truncate: a stale 'done' marker must not confuse any waiter
echo "=== tpu_queue_r3a start $(date -u +%FT%TZ) ===" | tee -a "$LOG"

run() {
  echo "--- $* ($(date -u +%T)) ---" | tee -a "$LOG"
  timeout 3600 "$@" 2>&1 | tail -50 | tee -a "$LOG"
}

run python benchmarks/bench_e2e_quick.py r3_baseline
run env MDT_TEMB=1 python benchmarks/bench_e2e_quick.py r3_temb
run python benchmarks/bench_train_step.py lora 8
run python benchmarks/bench_train_step.py full 2
run python benchmarks/bench_train_step.py full 8
run python benchmarks/bench_flags.py
run python benchmarks/bench_flags.py x8_conv lp_llo copy_elision copy_region licm2 cond_motion
run python benchmarks/profile_sd2.py 50
run python benchmarks/op_table.py /tmp/sd2_op_profile.json
run python benchmarks/bench_all.py sd2_768 glide_cascade

echo "=== tpu_queue_r3a done $(date -u +%FT%TZ) ===" | tee -a "$LOG"
