#!/bin/bash
# On-pool experiment queue, stage 2 (r2): XLA compiler-option sweep on the
# headline program. Serialized — only one process can hold the pooled chip.
# Each variant is a fresh remote compile (~7-8 min cold); the list below is
# ordered by expected value against the measured profile (relayout copies
# ~38 ms/program, conv-fusion soft spots, scheduler latency hiding).
#
# Usage: bash scripts/tpu_queue_r2.sh [logfile]
set -u
cd "$(dirname "$0")/.."
export JAX_PLATFORMS=axon
L=${1:-/tmp/r2_flags.log}
echo "=== r2 flag sweep start $(date -u)" >> "$L"
timeout 3600 python benchmarks/bench_flags.py \
    layout_negotiation copy_permute_minor ilp_scheduler exp_scheduler \
    >> "$L" 2>&1
echo "rc=$?" >> "$L"
echo "=== r2 flag sweep done $(date -u)" >> "$L"
