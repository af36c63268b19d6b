#!/bin/bash
# Round-3 TPU queue C: the 768² tier + GLIDE per-stage split + train full b4.
# Waits for queue B's done marker (B truncates its log at start, so the
# marker cannot be stale). Launch DETACHED:
#   setsid nohup bash scripts/tpu_queue_r3c.sh >/tmp/tpu_queue_r3c_runner.log 2>&1 &
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/minddiffusion_jax_cache
BLOG=/tmp/tpu_queue_r3b.log
LOG=/tmp/tpu_queue_r3c.log
: > "$LOG"
echo $$ > /tmp/tpu_queue_r3c.pid
while ! grep -q "tpu_queue_r3b done" "$BLOG" 2>/dev/null; do sleep 60; done
echo "=== tpu_queue_r3c start $(date -u +%FT%TZ) pid $$ ===" | tee -a "$LOG"

run() {
  echo "--- $* ($(date -u +%T)) ---" | tee -a "$LOG"
  timeout 3600 "$@" 2>&1 | tail -60 | tee -a "$LOG"
}

# licm winner confirmation: flag sweep showed licm2=1.924, licm8=1.920 vs
# 1.910 baseline (2-run). Confirm licm2 with the 3-run quick bench, probe the
# dose curve at 4, and try the only other >=baseline flag on top
run env MDT_XLA_OPTS=xla_tpu_licm_size_inflation_ratio=2 \
  python benchmarks/bench_e2e_quick.py licm2_confirm
run env MDT_XLA_OPTS=xla_tpu_licm_size_inflation_ratio=4 \
  python benchmarks/bench_e2e_quick.py licm4
run env MDT_XLA_OPTS=xla_tpu_licm_size_inflation_ratio=2,xla_tpu_enable_multi_level_nested_dot_fusion=true \
  python benchmarks/bench_e2e_quick.py licm2_nested_dot

# 768² tier: baseline pin (b8), the v5e-4 stretch per-chip anchor (b2), and a
# fresh 20-step op profile at 768² for the lever ranking
run env MDT_BENCH_RES=768 python benchmarks/bench_e2e_quick.py r768_b8
run env MDT_BENCH_RES=768 MDT_BENCH_BATCH=2 python benchmarks/bench_e2e_quick.py r768_b2
run env MDT_BENCH_RES=768 python benchmarks/profile_sd2.py 20
run python benchmarks/op_table.py /tmp/sd2_op_profile.json

# GLIDE cascade: per-stage split (where do the 4.1s/batch go?)
run python benchmarks/bench_glide_stages.py 8

# train: single-chip max batch for full finetune (b8 OOMs, b2 fits)
run python benchmarks/bench_train_step.py full 4

echo "=== tpu_queue_r3c done $(date -u +%FT%TZ) ===" | tee -a "$LOG"
