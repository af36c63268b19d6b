"""Quick e2e A/B: SD2 DDIM b8 (the driver-bench headline config by default),
honoring whatever MDT_* env flags are set, with the serving weight cast.

Usage: [MDT_...=...] python benchmarks/bench_e2e_quick.py [tag] [--no-cast]
Prints one line: `<tag>: <img/s> (runs: ...)`.

Config overrides (for the 768² tier etc.): MDT_BENCH_RES (default 512),
MDT_BENCH_BATCH (8), MDT_BENCH_STEPS (50), MDT_BENCH_SAMPLER (ddim).
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

from minddiffusion_tpu.pipelines.stable_diffusion import SDModels, StableDiffusionPipeline  # noqa: E402
from minddiffusion_tpu.utils.params import cast_serving_params  # noqa: E402


def main():
    tag = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("--") else "e2e"
    res = int(os.environ.get("MDT_BENCH_RES", "512"))
    batch = int(os.environ.get("MDT_BENCH_BATCH", "8"))
    steps = int(os.environ.get("MDT_BENCH_STEPS", "50"))
    sampler = os.environ.get("MDT_BENCH_SAMPLER", "ddim")
    models = SDModels.create(family="sd2", dtype=jnp.bfloat16,
                             attn_impl="pallas_fast")
    params = jax.jit(lambda r: models.init_params(r, height=res, width=res))(
        jax.random.PRNGKey(0))
    jax.block_until_ready(params)
    if "--no-cast" not in sys.argv:
        params = jax.jit(cast_serving_params)(params)
        jax.block_until_ready(params)

    pipe = StableDiffusionPipeline(models)
    fn = pipe.build_txt2img(height=res, width=res, num_steps=steps,
                            sampler=sampler, guidance_scale=9.0, batch_size=batch)
    tokens = jnp.ones((batch, 77), jnp.int32)
    uncond = jnp.zeros((batch, 77), jnp.int32)
    t0 = time.time()
    img = fn(params, tokens, uncond, jax.random.PRNGKey(1))
    np.asarray(img[0, 0, 0])
    print(f"[{tag}] compile+first: {time.time()-t0:.1f}s", file=sys.stderr)
    times = []
    for i in range(3):
        t0 = time.time()
        img = fn(params, tokens, uncond, jax.random.PRNGKey(2 + i))
        np.asarray(img[0, 0, 0])
        times.append(time.time() - t0)
    best = min(times)
    print(f"{tag}: {batch/best:.4f} img/s  (runs: "
          + ", ".join(f"{t:.3f}s" for t in times) + ")")


if __name__ == "__main__":
    main()
