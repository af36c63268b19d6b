#!/bin/bash
# Round-3 TPU queue G: GLIDE skip-join strategy A/B (r3f measured split =
# LOSS: SR 2229->2390 ms; srgan s2d fix = WIN: 204->108 ms), SD2
# aligned-merge ds1 A/B, VAE-tier winograd A/B.
# Launch DETACHED:
#   setsid nohup bash scripts/tpu_queue_r3g.sh >/tmp/tpu_queue_r3g_runner.log 2>&1 &
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/minddiffusion_jax_cache
FLOG=/tmp/tpu_queue_r3f.log
LOG=/tmp/tpu_queue_r3g.log
: > "$LOG"
echo $$ > /tmp/tpu_queue_r3g.pid
while ! grep -q "tpu_queue_r3f done" "$FLOG" 2>/dev/null; do sleep 60; done
echo "=== tpu_queue_r3g start $(date -u +%FT%TZ) pid $$ ===" | tee -a "$LOG"

run() {
  echo "--- $* ($(date -u +%T)) ---" | tee -a "$LOG"
  timeout 3600 "$@" 2>&1 | tail -40 | tee -a "$LOG"
}

# GLIDE: default is now plain concat again (+ s2d tail conv) — the expected
# ~2.00 anchor; then the barrier variant (keeps the concat out of the conv)
run python benchmarks/bench_glide_stages.py 8
run env MDT_GLIDE_SKIP_JOIN=barrier python benchmarks/bench_glide_stages.py 8

# SD2: merge the misaligned ds1 skip halves into the aligned 640-wide conv
run env MDT_MERGE_ALIGNED=1 python benchmarks/bench_e2e_quick.py merge_aligned

# SD2: VAE-decoder-tier winograd (aligned channels, DMA-halo kernel)
run env MDT_WINO_LARGE=512:128 python benchmarks/bench_e2e_quick.py vae_wino
run env MDT_WINO_LARGE=512:256 python benchmarks/bench_e2e_quick.py vae_wino_c256

echo "=== tpu_queue_r3g done $(date -u +%FT%TZ) ===" | tee -a "$LOG"
