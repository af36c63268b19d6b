"""Export framework weights to an LDM-layout .safetensors file.

The inverse workflow of weight ingestion: checkpoints trained here (orbax),
or reference weights loaded and LoRA-merged here, flow back out in the LDM
naming/layout the wider SD ecosystem consumes. No reference analogue (the
reference only loads MindSpore .ckpt files).

Example:
    python -m minddiffusion_tpu.cli.export_weights --family sd2 \
        --ckpt runs/finetune/ckpt_5000 --out sd2-finetuned.safetensors
    python -m minddiffusion_tpu.cli.export_weights --family wukong \
        --ckpt base.ckpt --lora_ckpt runs/lora/ckpt_800 --merge_lora \
        --out wukong-lora-merged.safetensors
"""
from __future__ import annotations

import argparse


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--family", default="sd2", choices=["sd2", "wukong"])
    p.add_argument("--ckpt", required=True,
                   help="orbax dir / torch .ckpt / .safetensors / MS .ckpt")
    p.add_argument("--lora_ckpt", default=None,
                   help="partial (trainable-only) LoRA checkpoint to overlay")
    p.add_argument("--merge_lora", action="store_true",
                   help="fold LoRA deltas into the base kernels before export")
    p.add_argument("--lora_rank", type=int, default=4)
    p.add_argument("--lora_alpha", type=float, default=4.0)
    p.add_argument("--out", required=True, help="output .safetensors path")
    p.add_argument("--height", type=int, default=512)
    p.add_argument("--width", type=int, default=512)
    p.add_argument("--debug_tiny", action="store_true")
    return p


def main(argv=None) -> None:
    args = build_argparser().parse_args(argv)

    from minddiffusion_tpu.cli.common import build_sd, load_params
    from minddiffusion_tpu.io import sd_weights

    enable_lora = bool(args.lora_ckpt or args.merge_lora)
    models = build_sd(args.family, "fp32", tiny=args.debug_tiny,
                      enable_lora=enable_lora)
    params = load_params(models, args.ckpt, args.height, args.width)
    if args.lora_ckpt:
        from minddiffusion_tpu.io.checkpoints import load_checkpoint, merge_params

        params = merge_params(params, load_checkpoint(args.lora_ckpt))
    if args.merge_lora:
        from minddiffusion_tpu.models.lora import merge_lora_params

        params = merge_lora_params(params, rank=args.lora_rank,
                                   alpha=args.lora_alpha)

    sd, report = sd_weights.export_sd_checkpoint(params, models.unet.config)
    for line in report[:20]:
        print(f"[export] {line}")
    if len(report) > 20:
        print(f"[export] ... {len(report) - 20} more")
    sd_weights.save_safetensors(sd, args.out, metadata={"format": "pt"})
    print(f"[export] wrote {len(sd)} tensors to {args.out}")


if __name__ == "__main__":
    main()
