#!/bin/bash
# Round-3 TPU queue H: GLIDE winograd-at-192ch A/B, GLIDE attention bq A/B.
# Waits for queue G's done marker. Launch DETACHED:
#   setsid nohup bash scripts/tpu_queue_r3h.sh >/tmp/tpu_queue_r3h_runner.log 2>&1 &
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/minddiffusion_jax_cache
GLOG=/tmp/tpu_queue_r3g.log
LOG=/tmp/tpu_queue_r3h.log
: > "$LOG"
echo $$ > /tmp/tpu_queue_r3h.pid
while ! grep -q "tpu_queue_r3g done" "$GLOG" 2>/dev/null; do sleep 60; done
echo "=== tpu_queue_r3h start $(date -u +%FT%TZ) pid $$ ===" | tee -a "$LOG"

run() {
  echo "--- $* ($(date -u +%T)) ---" | tee -a "$LOG"
  timeout 3600 "$@" 2>&1 | tail -40 | tee -a "$LOG"
}

# GLIDE: winograd at the 192-ch tiers (SR 256²/128²/64² + base 64²/32²...)
run env MDT_WINO_LARGE=256:192:any python benchmarks/bench_glide_stages.py 8
# narrower: SR 256² tier only stays direct, small-spatial 192 tiers via wino
run env MDT_WINO_LARGE=128:192:any python benchmarks/bench_glide_stages.py 8

# GLIDE: one whole-nq q tile at the short-nk attention sites
run env MDT_ATTN_BQ=1024 python benchmarks/bench_glide_stages.py 8

echo "=== tpu_queue_r3h done $(date -u +%FT%TZ) ===" | tee -a "$LOG"
