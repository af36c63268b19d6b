#!/usr/bin/env bash
# Multi-host TPU pod training. No rank tables: run this same command on every
# host of the slice (e.g. via `gcloud compute tpus tpu-vm ssh --worker=all`);
# jax.distributed.initialize() discovers the topology, the per-host dataset
# shard comes from jax.process_index() automatically.
set -e
export JAX_COORDINATOR="auto"
python -c "import jax; jax.distributed.initialize()" 2>/dev/null || true
python -m minddiffusion_tpu.cli.train \
    --config configs/train_config.json \
    --data_path "${DATA:-/data/train}" \
    --fsdp "${FSDP:-2}"
