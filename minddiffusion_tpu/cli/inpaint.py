"""Inpainting CLI — mirrors wukong-huahua inpaint.py:119-199 (image + mask +
prompt, 9-channel hybrid-conditioned UNet, PLMS) including the crop/resize/
resizecrop preprocessing choice (inpaint.py:161-184)."""
from __future__ import annotations

import argparse
import math

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
    p.add_argument("--aug", choices=["resize", "crop", "resizecrop", "none"],
                   default="resize",
                   help="preprocessing (reference inpaint.py:161-184): "
                        "resize = scale both to HxW; crop = HxW window "
                        "centred on the mask; resizecrop = crop a "
                        "mask_range/mask_ratio window around the mask, then "
                        "scale to HxW; none = use as-is")
    p.add_argument("--mask_ratio", type=float, default=0.75,
                   help="resizecrop: fraction of the crop the mask spans")
    p.add_argument("--debug_tiny", action="store_true",
                   help="miniature model for smoke tests (random weights)")
    return p


def _aug_func(args, image: Image.Image, mask_image: Image.Image):
    """The reference's aug selection (inpaint.py:161-184). The mask centroid
    / extent come from pixels where the mask's first channel > 127.5; crops
    are clipped so the window stays inside the image. The reference assumes
    square img_size; we use (W, H)."""
    w, h = args.W, args.H
    if args.aug == "resize":
        return lambda im: im.resize((w, h), Image.BICUBIC)
    if args.aug == "none":
        return lambda im: im
    mask_idx = np.where(np.asarray(mask_image.convert("RGB"))[:, :, 0] > 127.5)
    if mask_idx[0].size == 0:
        raise SystemExit("--aug crop/resizecrop needs a non-empty mask")
    # (row, col) means -> (x, y) center, like the reference's [::-1]
    center = np.array([mask_idx[1].mean(), mask_idx[0].mean()]).astype(int)
    if args.aug == "crop":
        cw, ch = w, h
    else:  # resizecrop: window sized so the mask spans mask_ratio of it
        mask_range = max(idx.max() - idx.min() for idx in mask_idx)
        cw = ch = math.ceil(mask_range / args.mask_ratio)
    cx = int(np.clip(center[0], cw // 2, max(image.size[0] - cw // 2, cw // 2)))
    cy = int(np.clip(center[1], ch // 2, max(image.size[1] - ch // 2, ch // 2)))
    box = (cx - cw // 2, cy - ch // 2, cx + cw // 2, cy + ch // 2)
    if args.aug == "crop":
        return lambda im: im.crop(box)
    return lambda im: im.crop(box).resize((w, h), Image.BICUBIC)


def _to_array(img: Image.Image, grayscale=False):
    arr = np.asarray(img.convert("L" if grayscale else "RGB"), np.float32)
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
    img_pil = Image.open(args.image_path)
    mask_pil = Image.open(args.mask_path)
    aug = _aug_func(args, img_pil, mask_pil)
    img_arr, mask_arr = _to_array(aug(img_pil)), _to_array(aug(mask_pil), True)
    if img_arr.shape[1:3] != (args.H, args.W):
        raise SystemExit(
            f"--aug {args.aug} produced {img_arr.shape[2]}x{img_arr.shape[1]}"
            f", expected {args.W}x{args.H} — use --aug resize/resizecrop or "
            "pass a matching --H/--W")
    image = jnp.asarray(np.repeat(img_arr, b, 0))
    mask = jnp.asarray(np.repeat(mask_arr, b, 0))
    tokens = jnp.asarray(tokenizer.tokenize([args.prompt] * b))
    uncond = jnp.asarray(tokenizer.tokenize([""] * b))

    images = fn(params, image, mask, tokens, uncond, jax.random.PRNGKey(args.seed))
    paths = common.save_images(images, args.outdir)
    print(f"saved {len(paths)} images to {args.outdir}")
    return paths


if __name__ == "__main__":
    main()
