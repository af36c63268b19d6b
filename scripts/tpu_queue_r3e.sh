#!/bin/bash
# Round-3 TPU queue E: HLO fusion->site mapping for the two open perf gaps.
#  - SD2: map convert_reduce_fusion.510/.516/.517/.523/.524 + fusion.6839
#    (the 136T below-cap conv class, 896 ms/50-step) to model sites.
#  - GLIDE: map fusion.3491 (114.5 ms @ 19 GB/s) + the 7-66T stragglers.
# Launch DETACHED:
#   setsid nohup bash scripts/tpu_queue_r3e.sh >/tmp/tpu_queue_r3e_runner.log 2>&1 &
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/minddiffusion_jax_cache
LOG=/tmp/tpu_queue_r3e.log
: > "$LOG"
echo $$ > /tmp/tpu_queue_r3e.pid
echo "=== tpu_queue_r3e start $(date -u +%FT%TZ) pid $$ ===" | tee -a "$LOG"

run() {
  local out="$1"; shift
  echo "--- $* -> $out ($(date -u +%T)) ---" | tee -a "$LOG"
  timeout 3600 "$@" > "$out" 2> >(tail -20 >> "$LOG")
  echo "[exit $?] $(wc -l < "$out") lines" | tee -a "$LOG"
}

# SD2: dump (compile is warm-cached from the r3d bench) + full fusion map
run /tmp/sd2_fusion_map.txt python benchmarks/hlo_map.py 50
run /tmp/sd2_fusion_find.txt python benchmarks/hlo_map.py --from-dump --find \
  convert_reduce_fusion.510,convert_reduce_fusion.516,convert_reduce_fusion.517,convert_reduce_fusion.523,convert_reduce_fusion.524,convert_reduce_fusion.422,convert_reduce_fusion.423,convert_reduce_fusion.424,fusion.6839,fusion.6852,fusion.6828,fusion.6829

# GLIDE: dump + map + the bandwidth-pathology bodies
run /tmp/glide_fusion_map.txt python benchmarks/hlo_map.py --family glide
run /tmp/glide_fusion_find.txt python benchmarks/hlo_map.py --family glide --from-dump --find \
  fusion.3491,fusion.10361,fusion.10352,fusion.10355,fusion.10360,convert_reduce_fusion.745,convert_reduce_fusion.749,add_add_fusion.138

echo "=== tpu_queue_r3e done $(date -u +%FT%TZ) ===" | tee -a "$LOG"
