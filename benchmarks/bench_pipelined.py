"""Blocking-per-batch vs pipelined (steady-state) throughput of the SD2
headline program.

The driver bench blocks on every batch, so each batch pays the host dispatch
gap (the axon relay adds ~25 ms per program launch). A serving deployment
keeps the device queue non-empty; this measures that steady state: enqueue N
batches back-to-back (JAX dispatch is async) and block once at the end.

    python benchmarks/bench_pipelined.py [batch] [steps] [n_pipelined]
"""
from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, __import__("os").path.dirname(
    __import__("os").path.dirname(__import__("os").path.abspath(__file__))))

import jax
import jax.numpy as jnp


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/minddiffusion_jax_cache")
    except Exception:
        pass
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    npipe = int(sys.argv[3]) if len(sys.argv) > 3 else 4

    from minddiffusion_tpu.pipelines.stable_diffusion import (
        SDModels, StableDiffusionPipeline)
    from minddiffusion_tpu.utils.params import cast_serving_params

    models = SDModels.create(family="sd2", dtype=jnp.bfloat16,
                             attn_impl="pallas_fast")
    params = jax.jit(lambda r: models.init_params(r, height=512, width=512))(
        jax.random.PRNGKey(0))
    params = jax.jit(cast_serving_params)(params)
    jax.block_until_ready(params)
    pipe = StableDiffusionPipeline(models)
    tokens = jnp.ones((batch, 77), jnp.int32)
    uncond = jnp.zeros((batch, 77), jnp.int32)
    fn = pipe.build_txt2img(height=512, width=512, num_steps=steps,
                            sampler="ddim", guidance_scale=9.0,
                            batch_size=batch)
    img = fn(params, tokens, uncond, jax.random.PRNGKey(1))
    img.block_until_ready()
    log("compiled + warm")

    results = {}
    # blocking per batch (the current driver-bench protocol)
    times = []
    for i in range(3):
        t0 = time.time()
        fn(params, tokens, uncond, jax.random.PRNGKey(2 + i)).block_until_ready()
        times.append(time.time() - t0)
    results["blocking_s_per_batch"] = round(min(times), 4)
    results["blocking_img_per_s"] = round(batch / min(times), 4)
    log(f"blocking: {min(times):.4f} s/batch ({batch/min(times):.4f} img/s)")

    # pipelined: enqueue npipe batches, block once (steady-state throughput);
    # min over 3 passes, matching the repo's min-of-runs protocol above
    dts = []
    for j in range(3):
        t0 = time.time()
        outs = [fn(params, tokens, uncond,
                   jax.random.PRNGKey(10 + j * npipe + i))
                for i in range(npipe)]
        jax.block_until_ready(outs)
        dts.append((time.time() - t0) / npipe)
        log(f"pipelined x{npipe} pass {j}: {dts[-1]:.4f} s/batch")
    dt = min(dts)
    results["pipelined_s_per_batch"] = round(dt, 4)
    results["pipelined_img_per_s"] = round(batch / dt, 4)
    log(f"pipelined x{npipe}: {dt:.4f} s/batch ({batch/dt:.4f} img/s)")

    print(json.dumps(results))


if __name__ == "__main__":
    main()
