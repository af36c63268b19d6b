#!/usr/bin/env bash
# wukong Chinese txt2img (DPM-Solver++ 15 steps, scale 7.5)
set -e
python -m minddiffusion_tpu.cli.txt2img --family wukong \
    --prompt "${1:-来自太空的长城照片}" \
    --ckpt_path "${CKPT:-models/wukong-huahua-ms.ckpt}" \
    --n_samples "${N_SAMPLES:-4}" --seed "${SEED:-42}"
