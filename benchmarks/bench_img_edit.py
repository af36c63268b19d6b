"""E2e TPU numbers for SD img2img and inpaint (BASELINE.md "configs to
cover": SD2 img2img + inpainting with PLMS at 512²).

img2img runs the sd2 family (DDIM — the only sampler with a mid-chain start,
pipelines/_run_sampler); inpaint runs the wukong 9-channel hybrid model with
PLMS-50 like the reference CLI (wukong-huahua/inpaint.py:65-117). Prints one
line per config: `<tag>: <img/s> (runs: ...)`.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/minddiffusion_jax_cache")

from minddiffusion_tpu.pipelines.stable_diffusion import (  # noqa: E402
    SDModels, StableDiffusionPipeline)
from minddiffusion_tpu.utils.params import cast_serving_params  # noqa: E402


def _timed(tag, fn, args, batch, n=3):
    t0 = time.time()
    out = fn(*args)
    np.asarray(out[0, 0, 0])
    print(f"[{tag}] compile+first: {time.time()-t0:.1f}s", file=sys.stderr)
    times = []
    for _ in range(n):
        t0 = time.time()
        out = fn(*args)
        np.asarray(out[0, 0, 0])
        times.append(time.time() - t0)
    best = min(times)
    print(f"{tag}: {batch/best:.4f} img/s  (runs: "
          + ", ".join(f"{t:.3f}s" for t in times) + ")")


def main():
    res = int(os.environ.get("MDT_BENCH_RES", "512"))
    batch = int(os.environ.get("MDT_BENCH_BATCH", "8"))
    steps = int(os.environ.get("MDT_BENCH_STEPS", "50"))
    key = jax.random.PRNGKey(0)

    # --- img2img (sd2, DDIM-50, strength .75 -> 38 executed steps) ---------
    models = SDModels.create(family="sd2", dtype=jnp.bfloat16,
                             attn_impl="pallas_fast")
    params = jax.jit(lambda r: models.init_params(r, height=res, width=res))(key)
    jax.block_until_ready(params)
    params = jax.jit(cast_serving_params)(params)
    jax.block_until_ready(params)
    pipe = StableDiffusionPipeline(models)
    fn = pipe.build_img2img(height=res, width=res, num_steps=steps,
                            strength=0.75, sampler="ddim", guidance_scale=9.0)
    init = jnp.zeros((batch, res, res, 3), jnp.float32)
    tokens = jnp.ones((batch, 77), jnp.int32)
    uncond = jnp.zeros((batch, 77), jnp.int32)
    _timed(f"img2img_{res}_ddim{steps}_s075_b{batch}", fn,
           (params, init, tokens, uncond, jax.random.PRNGKey(1)), batch)
    del params

    # --- inpaint (wukong 9-ch hybrid, PLMS-50 like the reference CLI) ------
    models = SDModels.create(family="wukong-inpaint", dtype=jnp.bfloat16,
                             attn_impl="pallas_fast")
    params = jax.jit(lambda r: models.init_params(r, height=res, width=res))(key)
    jax.block_until_ready(params)
    params = jax.jit(cast_serving_params)(params)
    jax.block_until_ready(params)
    pipe = StableDiffusionPipeline(models)
    fn = pipe.build_inpaint(height=res, width=res, num_steps=steps,
                            sampler="plms", guidance_scale=7.5)
    img = jnp.zeros((batch, res, res, 3), jnp.float32)
    mask = jnp.ones((batch, res, res, 1), jnp.float32)
    _timed(f"inpaint_{res}_plms{steps}_b{batch}", fn,
           (params, img, mask, tokens, uncond, jax.random.PRNGKey(2)), batch)


if __name__ == "__main__":
    main()
