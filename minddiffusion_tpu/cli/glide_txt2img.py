"""GLIDE cascade CLI — mirrors Taichu-GLIDE/src/txt2img.py:140-157 (prompt
file or prompt, pics_generated, guidance_scale, 60-step base + 27-step
super-res + SRGAN x4; outputs all three stages)."""
from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from minddiffusion_tpu.cli import common
from minddiffusion_tpu.pipelines.glide_cascade import GlideCascadePipeline, GlideModels
from minddiffusion_tpu.text.glide_text import GlideSentencePieceTokenizer, prepare_cond_tokens
from minddiffusion_tpu.utils.config import set_random_seed


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="TPU-native GLIDE cascade txt2img")
    p.add_argument("--prompt", type=str, required=True)
    p.add_argument("--ckpt_path", type=str, default=None, help="orbax dir")
    p.add_argument("--tokenizer_model", type=str, default=None,
                   help="sentencepiece model (cog-pretrain.model)")
    p.add_argument("--outdir", type=str, default="output/glide-samples")
    p.add_argument("--pics_generated", type=int, default=8)
    p.add_argument("--guidance_scale", type=float, default=5.0)
    p.add_argument("--denoise_steps", type=str, default="60")
    p.add_argument("--super_res_steps", type=str, default="fast27")
    p.add_argument("--no_srgan", action="store_true")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--dtype", choices=["bf16", "fp32"], default="bf16")
    p.add_argument("--uncond_mode", choices=["per_generation", "per_step"],
                   default="per_generation",
                   help="per_step = reference-exact CFG uncond re-draw "
                        "(guider.py:36-50); slower, xf runs inside the scan")
    return p


def main(argv=None) -> dict:
    args = build_parser().parse_args(argv)
    set_random_seed(args.seed)

    models = GlideModels.create(
        dtype=jnp.bfloat16 if args.dtype == "bf16" else jnp.float32,
        base_respacing=args.denoise_steps,
        sr_respacing=args.super_res_steps,
        with_srgan=not args.no_srgan)

    if args.ckpt_path:
        from minddiffusion_tpu.io.checkpoints import load_checkpoint

        params = load_checkpoint(args.ckpt_path)
    else:
        print("WARNING: no checkpoint — RANDOM weights (noise images)")
        params = models.init_params(jax.random.PRNGKey(args.seed))

    ctx = models.base.xf_config.text_ctx
    if args.tokenizer_model:
        tok = GlideSentencePieceTokenizer(args.tokenizer_model)
        tokens_np, mask_np = prepare_cond_tokens(tok, args.prompt,
                                                 args.pics_generated, ctx)
    else:
        print("WARNING: no tokenizer model — using placeholder token ids")
        tokens_np = np.ones((args.pics_generated, ctx), np.int32)
        mask_np = np.ones((args.pics_generated, ctx), np.int32)

    pipe = GlideCascadePipeline(models)
    fn = pipe.build_generate(batch_size=args.pics_generated,
                             guidance_scale=args.guidance_scale,
                             run_srgan=not args.no_srgan,
                             uncond_mode=args.uncond_mode)
    out = fn(params, jnp.asarray(tokens_np), jnp.asarray(mask_np),
             jax.random.PRNGKey(args.seed))
    saved = {}
    for stage, images in out.items():
        saved[stage] = common.save_images(images, f"{args.outdir}/{stage}")
    for stage, paths in saved.items():
        print(f"{stage}: saved {len(paths)} to {args.outdir}/{stage}")
    return saved


if __name__ == "__main__":
    main()
