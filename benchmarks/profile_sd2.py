"""Profile the SD2 txt2img program on TPU and print the per-op breakdown.

Traces a short (few-step) build of the same jitted program the bench runs,
parses the xplane with xprof's op_profile converter, and prints the top ops
by self-time. Run from the repo root.
"""
from __future__ import annotations

import glob
import json
import os
import sys
import time

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/minddiffusion_jax_cache")

from minddiffusion_tpu.pipelines.stable_diffusion import SDModels, StableDiffusionPipeline  # noqa: E402


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    res = int(os.environ.get("MDT_BENCH_RES", "512"))
    batch = int(os.environ.get("MDT_BENCH_BATCH", "8"))
    trace_dir = "/tmp/sd2_trace"
    os.system(f"rm -rf {trace_dir}")

    # mirror bench_e2e_quick's shipping config exactly (pallas_fast softmax +
    # serving weight cast) — the r3 profile captured with the default impl
    # ran 4.265s vs the shipping 4.19s and skewed the attention rates
    models = SDModels.create(
        family="sd2", dtype=jnp.bfloat16,
        attn_impl=os.environ.get("MDT_PROF_ATTN") or "pallas_fast")
    params = jax.jit(lambda r: models.init_params(r, height=res, width=res))(
        jax.random.PRNGKey(0))
    jax.block_until_ready(params)
    from minddiffusion_tpu.utils.params import cast_serving_params
    params = jax.jit(cast_serving_params)(params)
    jax.block_until_ready(params)

    pipe = StableDiffusionPipeline(models)
    fn = pipe.build_txt2img(height=res, width=res, num_steps=steps,
                            sampler="ddim", guidance_scale=9.0, batch_size=batch)
    tokens = jnp.ones((batch, 77), jnp.int32)
    uncond = jnp.zeros((batch, 77), jnp.int32)

    img = fn(params, tokens, uncond, jax.random.PRNGKey(1))
    np.asarray(img[0, 0, 0])

    t0 = time.time()
    img = fn(params, tokens, uncond, jax.random.PRNGKey(2))
    np.asarray(img[0, 0, 0])
    wall = time.time() - t0
    print(f"steady-state wall for {steps} steps batch {batch} at {res}²: "
          f"{wall:.3f}s", file=sys.stderr)

    jax.profiler.start_trace(trace_dir)
    img = fn(params, tokens, uncond, jax.random.PRNGKey(3))
    np.asarray(img[0, 0, 0])
    jax.profiler.stop_trace()

    from xprof_util import trace_to_op_profile
    trace_to_op_profile(trace_dir, "/tmp/sd2_op_profile.json")
    print("summarize with: python benchmarks/op_table.py "
          "/tmp/sd2_op_profile.json", file=sys.stderr)


if __name__ == "__main__":
    main()
