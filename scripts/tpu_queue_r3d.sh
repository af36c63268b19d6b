#!/bin/bash
# Round-3 TPU queue D: confirm the SHIPPED licm2 default, PLMS re-pin, the
# TRUE 512² shipping-config profile (op_table category fix), and the GLIDE
# cascade profile for SR-stage lever ranking. Launch DETACHED:
#   setsid nohup bash scripts/tpu_queue_r3d.sh >/tmp/tpu_queue_r3d_runner.log 2>&1 &
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/minddiffusion_jax_cache
LOG=/tmp/tpu_queue_r3d.log
: > "$LOG"
echo $$ > /tmp/tpu_queue_r3d.pid
echo "=== tpu_queue_r3d start $(date -u +%FT%TZ) pid $$ ===" | tee -a "$LOG"

run() {
  echo "--- $* ($(date -u +%T)) ---" | tee -a "$LOG"
  timeout 3600 "$@" 2>&1 | tail -80 | tee -a "$LOG"
}

# SHIPPED licm2 is now the default path — no env needed. Expect ~1.923.
run python benchmarks/bench_e2e_quick.py shipped_r3d

# PLMS with the shipped options (VERDICT target: >= 1.95)
run env MDT_BENCH_SAMPLER=plms python benchmarks/bench_e2e_quick.py plms_shipped

# TRUE 512² composition: shipping attn impl + serving cast + licm2, with the
# category-accurate op_table
run python benchmarks/profile_sd2.py 50
run python benchmarks/op_table.py /tmp/sd2_op_profile.json 30

# GLIDE cascade xprof -> SR-stage lever ranking
run python benchmarks/bench_glide_stages.py 8 profile
run python benchmarks/op_table.py /tmp/glide_op_profile.json 30

echo "=== tpu_queue_r3d done $(date -u +%FT%TZ) ===" | tee -a "$LOG"
