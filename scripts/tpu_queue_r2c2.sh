#!/bin/bash
# Queue 2: waits for queue 1's done marker, then A/Bs MDT_TEMB e2e.
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/minddiffusion_jax_cache
LOG=/tmp/tpu_queue_r2c.log
while ! grep -q "tpu_queue_r2c done" "$LOG" 2>/dev/null; do sleep 30; done
echo "=== queue2 start $(date -u +%FT%TZ) ===" | tee -a "$LOG"
echo "--- MDT_TEMB=1 e2e A/B ---" | tee -a "$LOG"
MDT_TEMB=1 timeout 3000 python benchmarks/bench_e2e_quick.py temb 2>&1 | tail -6 | tee -a "$LOG"
echo "--- MDT_TEMB=1 PLMS check via bench_all? skipped ---" | tee -a "$LOG"
echo "=== queue2 done $(date -u +%FT%TZ) ===" | tee -a "$LOG"
