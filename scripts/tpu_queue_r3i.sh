#!/bin/bash
# Round-3 TPU queue I: the decisive SD2 512² A/B batch.
#   1. same-session baseline re-pin
#   2. MDT_MERGE_ALIGNED=1 confirm (r3g: 1.9427 vs 1.923 anchor — needs a
#      same-session baseline pair before promoting the default)
#   3. MDT_GN_BARRIER=1 (extended to the winograd GN-affine partial-sum
#      sites, commit 31ad36a — targets the 896 ms convert_reduce class)
#   4. both combined
# Waits for queue H's done marker. Launch DETACHED:
#   setsid nohup bash scripts/tpu_queue_r3i.sh >/tmp/tpu_queue_r3i_runner.log 2>&1 &
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/minddiffusion_jax_cache
HLOG=/tmp/tpu_queue_r3h.log
LOG=/tmp/tpu_queue_r3i.log
: > "$LOG"
echo $$ > /tmp/tpu_queue_r3i.pid
while ! grep -q "tpu_queue_r3h done" "$HLOG" 2>/dev/null; do sleep 30; done
echo "=== tpu_queue_r3i start $(date -u +%FT%TZ) pid $$ ===" | tee -a "$LOG"

run() {
  echo "--- $* ($(date -u +%T)) ---" | tee -a "$LOG"
  timeout 3600 "$@" 2>&1 | tail -40 | tee -a "$LOG"
}

run python benchmarks/bench_e2e_quick.py base_r3i
run env MDT_MERGE_ALIGNED=1 python benchmarks/bench_e2e_quick.py merge_aligned2
run env MDT_GN_BARRIER=1 python benchmarks/bench_e2e_quick.py gn_barrier_ext
run env MDT_GN_BARRIER=1 MDT_MERGE_ALIGNED=1 python benchmarks/bench_e2e_quick.py gnb_plus_merge

echo "=== tpu_queue_r3i done $(date -u +%FT%TZ) ===" | tee -a "$LOG"
