"""Extended benchmark sweep: every headline config across the three families.

`bench.py` at the repo root is the driver's single-metric entry point (SD2
512 DDIM-50). This script measures the full matrix and prints one JSON line
per config — run it on a TPU host for the complete picture:

    python benchmarks/bench_all.py            # all configs
    python benchmarks/bench_all.py sd2 wukong # subset
"""
from __future__ import annotations

import json
import os
import sys
import time

# the script lives in benchmarks/; make the repo importable when invoked by path
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def _sync(x):
    np.asarray(jax.tree.leaves(x)[0][(0,) * jax.tree.leaves(x)[0].ndim])


def _time(fn, args, runs=3):
    _sync(fn(*args))  # compile + warm
    times = []
    for _ in range(runs):
        t0 = time.time()
        _sync(fn(*args))
        times.append(time.time() - t0)
    return min(times)


def bench_sd(family, sampler, steps, scale, batch, height=512, width=512):
    from minddiffusion_tpu.pipelines.stable_diffusion import SDModels, StableDiffusionPipeline

    models = SDModels.create(family=family, dtype=jnp.bfloat16)
    params = jax.jit(lambda r: models.init_params(r, height=height, width=width))(
        jax.random.PRNGKey(0))
    jax.block_until_ready(params)
    fn = StableDiffusionPipeline(models).build_txt2img(
        height=height, width=width, num_steps=steps, sampler=sampler,
        guidance_scale=scale, batch_size=batch)
    toks = jnp.ones((batch, 77), jnp.int32)
    dt = _time(fn, (params, toks, jnp.zeros_like(toks), jax.random.PRNGKey(1)))
    return batch / dt


def _serving_params(models, res):
    """Init + serving-cast params (the tuned config the r4d img-edit numbers
    were measured with, benchmarks/bench_img_edit.py)."""
    from minddiffusion_tpu.utils.params import cast_serving_params

    params = jax.jit(lambda r: models.init_params(r, height=res, width=res))(
        jax.random.PRNGKey(0))
    params = jax.jit(cast_serving_params)(params)
    jax.block_until_ready(params)
    return params


def bench_img2img(batch=8, res=512, steps=50):
    """SD2 img2img, DDIM strength 0.75 (38 executed steps). r4d: 2.5503."""
    from minddiffusion_tpu.pipelines.stable_diffusion import SDModels, StableDiffusionPipeline

    models = SDModels.create(family="sd2", dtype=jnp.bfloat16,
                             attn_impl="pallas_fast")
    params = _serving_params(models, res)
    fn = StableDiffusionPipeline(models).build_img2img(
        height=res, width=res, num_steps=steps, strength=0.75,
        sampler="ddim", guidance_scale=9.0)
    toks = jnp.ones((batch, 77), jnp.int32)
    init = jnp.zeros((batch, res, res, 3), jnp.float32)
    dt = _time(fn, (params, init, toks, jnp.zeros_like(toks),
                    jax.random.PRNGKey(1)))
    return batch / dt


def bench_inpaint(batch=8, res=512, steps=50):
    """wukong 9-ch hybrid inpaint, PLMS like the reference CLI
    (wukong-huahua/inpaint.py:65-117). r4d: 1.5529."""
    from minddiffusion_tpu.pipelines.stable_diffusion import SDModels, StableDiffusionPipeline

    models = SDModels.create(family="wukong-inpaint", dtype=jnp.bfloat16,
                             attn_impl="pallas_fast")
    params = _serving_params(models, res)
    fn = StableDiffusionPipeline(models).build_inpaint(
        height=res, width=res, num_steps=steps, sampler="plms",
        guidance_scale=7.5)
    toks = jnp.ones((batch, 77), jnp.int32)
    img = jnp.zeros((batch, res, res, 3), jnp.float32)
    mask = jnp.ones((batch, res, res, 1), jnp.float32)
    dt = _time(fn, (params, img, mask, toks, jnp.zeros_like(toks),
                    jax.random.PRNGKey(2)))
    return batch / dt


def bench_glide(batch=8):
    from minddiffusion_tpu.pipelines.glide_cascade import GlideCascadePipeline, GlideModels

    # serving config: raw-exp softmax kernel (r5b same-claim A/B:
    # 2.0189 vs 2.0030 exact — same bit-exactness argument as SD's
    # pallas_fast headline, logits far below the fp32 exp overflow)
    models = GlideModels.create(dtype=jnp.bfloat16,
                                attn_impl="pallas_fast")
    params = jax.jit(lambda r: models.init_params(r))(jax.random.PRNGKey(0))
    jax.block_until_ready(params)
    fn = GlideCascadePipeline(models).build_generate(batch_size=batch)
    toks = jnp.ones((batch, 128), jnp.int32)
    mask = jnp.ones((batch, 128), jnp.int32)
    dt = _time(fn, (params, toks, mask, jax.random.PRNGKey(1)))
    return batch / dt


CONFIGS = {
    "sd2": lambda: bench_sd("sd2", "ddim", 50, 9.0, 8),
    "sd2_plms": lambda: bench_sd("sd2", "plms", 50, 9.0, 8),
    "wukong": lambda: bench_sd("wukong", "dpm", 15, 7.5, 8),
    "sd2_768": lambda: bench_sd("sd2", "ddim", 50, 9.0, 8, height=768, width=768),
    "glide_cascade": lambda: bench_glide(8),
    "img2img": lambda: bench_img2img(8),
    "inpaint": lambda: bench_inpaint(8),
}


def main():
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/minddiffusion_jax_cache")
    except Exception:
        pass
    wanted = sys.argv[1:] or list(CONFIGS)
    for name in wanted:
        log(f"benchmarking {name}...")
        try:
            v = CONFIGS[name]()
            print(json.dumps({"metric": name, "value": round(v, 4),
                              "unit": "img/s/chip"}))
        except Exception as e:
            print(json.dumps({"metric": name, "error": str(e)[:200]}))


if __name__ == "__main__":
    main()
