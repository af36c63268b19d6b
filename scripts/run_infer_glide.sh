#!/usr/bin/env bash
# GLIDE cascade: 60-step guided base -> fast27 super-res -> SRGAN x4
set -e
python -m minddiffusion_tpu.cli.glide_txt2img \
    --prompt "${1:-一只可爱的猫}" \
    --ckpt_path "${CKPT:-models/glide_orbax}" \
    --tokenizer_model "${SP_MODEL:-models/cog-pretrain.model}" \
    --pics_generated "${PICS:-8}"
