#!/bin/bash
# Round-3 TPU queue J: final shipped-default confirm — a plain e2e run with
# NO env flags, exercising exactly the program the driver's bench.py will
# compile (aligned-merge default promoted in commit 9140866, licm2 in
# xla_opts.SHIPPED). Waits for queue I. Launch DETACHED:
#   setsid nohup bash scripts/tpu_queue_r3j.sh >/tmp/tpu_queue_r3j_runner.log 2>&1 &
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/minddiffusion_jax_cache
ILOG=/tmp/tpu_queue_r3i.log
LOG=/tmp/tpu_queue_r3j.log
: > "$LOG"
echo $$ > /tmp/tpu_queue_r3j.pid
while ! grep -q "tpu_queue_r3i done" "$ILOG" 2>/dev/null; do sleep 30; done
echo "=== tpu_queue_r3j start $(date -u +%FT%TZ) pid $$ ===" | tee -a "$LOG"

run() {
  echo "--- $* ($(date -u +%T)) ---" | tee -a "$LOG"
  timeout 3600 "$@" 2>&1 | tail -40 | tee -a "$LOG"
}

run python benchmarks/bench_e2e_quick.py shipped_final

echo "=== tpu_queue_r3j done $(date -u +%FT%TZ) ===" | tee -a "$LOG"
