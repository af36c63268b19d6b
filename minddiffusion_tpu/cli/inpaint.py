"""Inpainting CLI — mirrors wukong-huahua inpaint.py:119-199 (image + mask +
prompt, 9-channel hybrid-conditioned UNet, PLMS)."""
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
    p = argparse.ArgumentParser(description="TPU-native SD inpainting")
    p.add_argument("--prompt", type=str, required=True)
    p.add_argument("--image_path", type=str, required=True)
    p.add_argument("--mask_path", type=str, required=True,
                   help="white (>=0.5) = region to repaint")
    p.add_argument("--ckpt_path", type=str, default=None)
    p.add_argument("--outdir", type=str, default="output/inpaint-samples")
    p.add_argument("--H", type=int, default=512)
    p.add_argument("--W", type=int, default=512)
    p.add_argument("--sampling_steps", type=int, default=50)
    p.add_argument("--scale", type=float, default=7.5)
    p.add_argument("--n_samples", type=int, default=1)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--dtype", choices=["bf16", "fp32"], default="bf16")
    p.add_argument("--debug_tiny", action="store_true",
                   help="miniature model for smoke tests (random weights)")
    return p


def _load_image(path, h, w, grayscale=False):
    img = Image.open(path)
    img = img.convert("L" if grayscale else "RGB").resize((w, h), Image.BICUBIC)
    arr = np.asarray(img, np.float32)
    if grayscale:
        return (arr / 255.0)[None, ..., None]
    return (arr / 127.5 - 1.0)[None]


def main(argv=None) -> list:
    args = build_parser().parse_args(argv)
    set_random_seed(args.seed)

    models = common.build_sd("wukong-inpaint", args.dtype, tiny=args.debug_tiny)
    params = common.load_params(models, args.ckpt_path, args.H, args.W, args.seed)
    tokenizer = common.tokenizer_for("wukong")

    fn = StableDiffusionPipeline(models).build_inpaint(
        height=args.H, width=args.W, num_steps=args.sampling_steps,
        guidance_scale=args.scale)

    b = args.n_samples
    image = jnp.asarray(np.repeat(_load_image(args.image_path, args.H, args.W), b, 0))
    mask = jnp.asarray(np.repeat(_load_image(args.mask_path, args.H, args.W, True), b, 0))
    tokens = jnp.asarray(tokenizer.tokenize([args.prompt] * b))
    uncond = jnp.asarray(tokenizer.tokenize([""] * b))

    images = fn(params, image, mask, tokens, uncond, jax.random.PRNGKey(args.seed))
    paths = common.save_images(images, args.outdir)
    print(f"saved {len(paths)} images to {args.outdir}")
    return paths


if __name__ == "__main__":
    main()
