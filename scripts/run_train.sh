#!/usr/bin/env bash
# Single-host training; mesh spans all local TPU chips (dp x fsdp).
set -e
python -m minddiffusion_tpu.cli.train \
    --config configs/train_config.json \
    --data_path "${DATA:-/data/train}" \
    --fsdp "${FSDP:-1}"
