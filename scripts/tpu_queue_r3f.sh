#!/bin/bash
# Round-3 TPU queue F: measure the GLIDE fixes (s2d4 tail conv + split-concat
# up path), retry the SD2 HLO dump (worker crashed in r3e), and retest the
# GN-stat barrier under the now-shipped licm2 flag.
# Launch DETACHED:
#   setsid nohup bash scripts/tpu_queue_r3f.sh >/tmp/tpu_queue_r3f_runner.log 2>&1 &
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/minddiffusion_jax_cache
LOG=/tmp/tpu_queue_r3f.log
: > "$LOG"
echo $$ > /tmp/tpu_queue_r3f.pid
echo "=== tpu_queue_r3f start $(date -u +%FT%TZ) pid $$ ===" | tee -a "$LOG"

run() {
  echo "--- $* ($(date -u +%T)) ---" | tee -a "$LOG"
  timeout 3600 "$@" 2>&1 | tail -40 | tee -a "$LOG"
}
runf() {
  local out="$1"; shift
  echo "--- $* -> $out ($(date -u +%T)) ---" | tee -a "$LOG"
  timeout 3600 "$@" > "$out" 2> >(tail -20 >> "$LOG")
  echo "[exit $?] $(wc -l < "$out") lines" | tee -a "$LOG"
}

# GLIDE with the two fixes (fresh compile): per-stage + fused cascade
run python benchmarks/bench_glide_stages.py 8
# control: blocked tail conv off isolates the two fixes' contributions
run env MDT_SRGAN_S2D=0 python benchmarks/bench_glide_stages.py 8

# SD2 fusion->site map (retry after r3e worker crash)
runf /tmp/sd2_fusion_map.txt python benchmarks/hlo_map.py 50
runf /tmp/sd2_fusion_find.txt python benchmarks/hlo_map.py --from-dump --find \
  convert_reduce_fusion.510,convert_reduce_fusion.516,convert_reduce_fusion.517,convert_reduce_fusion.523,convert_reduce_fusion.524,convert_reduce_fusion.422,convert_reduce_fusion.423,convert_reduce_fusion.424,convert_reduce_fusion.656,convert_reduce_fusion.654,fusion.6839,fusion.6852,fusion.6828,fusion.6829

# GN-stat barrier retest now that licm2 ships (landscape changed since the
# 1.901-vs-1.906 neutral verdict)
run env MDT_GN_BARRIER=1 python benchmarks/bench_e2e_quick.py gn_barrier_licm2

echo "=== tpu_queue_r3f done $(date -u +%FT%TZ) ===" | tee -a "$LOG"
