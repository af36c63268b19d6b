"""txt2img CLI — flag surface mirrors the reference entry point
(stablediffusionv2/txt2img.py:66-194: prompt, H/W, sampling_steps, scale,
seed, n_samples, n_iter, outdir, ckpt_path, plms/dpm_solver choice), with
`--family sd2|wukong` replacing the per-repo split.

    python -m minddiffusion_tpu.cli.txt2img --prompt "a horse" --ckpt sd.ckpt
"""
from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from minddiffusion_tpu.cli import common
from minddiffusion_tpu.pipelines.stable_diffusion import StableDiffusionPipeline
from minddiffusion_tpu.utils.config import set_random_seed


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="TPU-native Stable Diffusion txt2img")
    p.add_argument("--prompt", type=str, required=True)
    p.add_argument("--negative_prompt", type=str, default="")
    p.add_argument("--family", choices=["sd2", "wukong"], default="sd2")
    p.add_argument("--ckpt_path", type=str, default=None,
                   help="orbax dir, torch .ckpt, or .safetensors")
    p.add_argument("--outdir", type=str, default="output/txt2img-samples")
    p.add_argument("--H", type=int, default=512)
    p.add_argument("--W", type=int, default=512)
    p.add_argument("--sampling_steps", type=int, default=50)
    p.add_argument("--sampler",
                   choices=["plms", "ddim", "dpm", "dpm_singlestep",
                            "dpm_adaptive"],
                   default=None,
                   help="default: plms for sd2 (reference txt2img.py:143), "
                        "dpm for wukong (run_txt2img.sh:27)")
    p.add_argument("--scale", type=float, default=None,
                   help="CFG scale; default 9.0 (sd2) / 7.5 (wukong)")
    p.add_argument("--n_samples", type=int, default=4, help="batch size")
    p.add_argument("--n_iter", type=int, default=1, help="batches to generate")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--dtype", choices=["bf16", "fp32"], default="bf16")
    p.add_argument("--debug_tiny", action="store_true",
                   help="miniature model for smoke tests (random weights)")
    p.add_argument("--dump_hlo", type=str, default=None,
                   help="write the optimized HLO of the pipeline program here "
                        "(reference --save_graph equivalent)")
    return p


def main(argv=None) -> list:
    args = build_parser().parse_args(argv)
    sampler = args.sampler or ("plms" if args.family == "sd2" else "dpm")
    scale = args.scale if args.scale is not None else (9.0 if args.family == "sd2" else 7.5)
    if sampler == "dpm" and args.sampling_steps == 50 and args.family == "wukong":
        args.sampling_steps = 15  # wukong default (run_txt2img.sh:28)
    set_random_seed(args.seed)

    models = common.build_sd(args.family, args.dtype, tiny=args.debug_tiny)
    params = common.load_params(models, args.ckpt_path, args.H, args.W, args.seed)
    tokenizer = common.tokenizer_for(args.family)

    fn = StableDiffusionPipeline(models).build_txt2img(
        height=args.H, width=args.W, num_steps=args.sampling_steps,
        sampler=sampler, guidance_scale=scale, batch_size=args.n_samples)

    tokens = jnp.asarray(tokenizer.tokenize([args.prompt] * args.n_samples))
    uncond = jnp.asarray(tokenizer.tokenize([args.negative_prompt] * args.n_samples))

    key = jax.random.PRNGKey(args.seed)
    if args.dump_hlo:
        compiled = fn.lower(params, tokens, uncond, key).compile()
        with open(args.dump_hlo, "w") as f:
            f.write(compiled.as_text())
        print(f"wrote optimized HLO to {args.dump_hlo}")
    all_paths = []
    for it in range(args.n_iter):
        key, sub = jax.random.split(key)
        t0 = time.time()
        images = fn(params, tokens, uncond, sub)
        np.asarray(images)  # block
        print(f"the infer time of a batch is {time.time() - t0:.3f}s")
        all_paths += common.save_images(images, args.outdir)
    print(f"saved {len(all_paths)} images to {args.outdir}")
    return all_paths


if __name__ == "__main__":
    main()
