"""img2img CLI — encode init image, q_sample to strength, denoise (the
reference exposes this path through LatentDiffusion's img2img machinery;
ddpm.py:269-288)."""
from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from minddiffusion_tpu.cli import common
from minddiffusion_tpu.pipelines.stable_diffusion import StableDiffusionPipeline
from minddiffusion_tpu.utils.config import set_random_seed


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="TPU-native SD img2img")
    p.add_argument("--prompt", type=str, required=True)
    p.add_argument("--init_image", type=str, required=True)
    p.add_argument("--strength", type=float, default=0.75)
    p.add_argument("--family", choices=["sd2", "wukong"], default="sd2")
    p.add_argument("--ckpt_path", type=str, default=None)
    p.add_argument("--outdir", type=str, default="output/img2img-samples")
    p.add_argument("--H", type=int, default=512)
    p.add_argument("--W", type=int, default=512)
    p.add_argument("--sampling_steps", type=int, default=50)
    p.add_argument("--scale", type=float, default=9.0)
    p.add_argument("--n_samples", type=int, default=1)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--dtype", choices=["bf16", "fp32"], default="bf16")
    p.add_argument("--debug_tiny", action="store_true",
                   help="miniature model for smoke tests (random weights)")
    return p


def main(argv=None) -> list:
    args = build_parser().parse_args(argv)
    set_random_seed(args.seed)
    models = common.build_sd(args.family, args.dtype, tiny=args.debug_tiny)
    params = common.load_params(models, args.ckpt_path, args.H, args.W, args.seed)
    tokenizer = common.tokenizer_for(args.family)

    fn = StableDiffusionPipeline(models).build_img2img(
        height=args.H, width=args.W, num_steps=args.sampling_steps,
        strength=args.strength, guidance_scale=args.scale)

    img = Image.open(args.init_image).convert("RGB").resize(
        (args.W, args.H), Image.BICUBIC)
    init = jnp.asarray(
        np.repeat((np.asarray(img, np.float32) / 127.5 - 1.0)[None],
                  args.n_samples, 0))
    tokens = jnp.asarray(tokenizer.tokenize([args.prompt] * args.n_samples))
    uncond = jnp.asarray(tokenizer.tokenize([""] * args.n_samples))

    images = fn(params, init, tokens, uncond, jax.random.PRNGKey(args.seed))
    paths = common.save_images(images, args.outdir)
    print(f"saved {len(paths)} images to {args.outdir}")
    return paths


if __name__ == "__main__":
    main()
