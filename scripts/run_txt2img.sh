#!/usr/bin/env bash
# SD2 txt2img with reference-default settings (PLMS-50, scale 9.0, seed 42)
set -e
python -m minddiffusion_tpu.cli.txt2img \
    --prompt "${1:-a professional photograph of an astronaut riding a horse}" \
    --ckpt_path "${CKPT:-models/sd-v2.ckpt}" \
    --n_samples "${N_SAMPLES:-4}" --seed "${SEED:-42}" \
    --outdir output/txt2img-samples
