"""Benchmark: SD2 512x512 txt2img, 50-step DDIM, img/s/chip on one TPU.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline target (BASELINE.json): 2.0 img/s/chip on TPU v5e. The reference
itself publishes no throughput numbers — only the "8 simultaneous 512x512
images per Ascend 910" capacity claim (stablediffusionv2/README.md:58), which
batch=8 here mirrors.

The whole pipeline (CLIP-H encode of the CFG-folded token batch -> 50-step
DDIM lax.scan over the UNet -> VAE decode -> uint8) is ONE jitted XLA program;
the reference's host loop launches ~101 separate UNet graphs per batch
(plms.py:151-177). Weights are random-init (throughput is weight-agnostic).
"""
from __future__ import annotations

import json
import sys
import time


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main() -> None:
    t_start = time.time()
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/minddiffusion_jax_cache")
    except Exception:
        pass
    import jax.numpy as jnp

    from minddiffusion_tpu.pipelines.stable_diffusion import SDModels, StableDiffusionPipeline

    dev = jax.devices()[0]
    log(f"device: {dev.device_kind} ({jax.default_backend()})")

    BATCH = 8
    STEPS = 50
    H = W = 512

    models = SDModels.create(family="sd2", dtype=jnp.bfloat16)
    log("initializing params (random weights, jitted as one program)...")
    params = jax.jit(
        lambda r: models.init_params(r, height=H, width=W)
    )(jax.random.PRNGKey(0))
    jax.block_until_ready(params)
    n_params = sum(x.size for x in jax.tree.leaves(params))
    log(f"params: {n_params/1e6:.0f}M")

    pipe = StableDiffusionPipeline(models)
    fn = pipe.build_txt2img(height=H, width=W, num_steps=STEPS, sampler="ddim",
                            guidance_scale=9.0, batch_size=BATCH)

    tokens = jnp.ones((BATCH, 77), jnp.int32)
    uncond = jnp.zeros((BATCH, 77), jnp.int32)

    log("compiling + first run...")
    t0 = time.time()
    img = fn(params, tokens, uncond, jax.random.PRNGKey(1))
    img.block_until_ready()
    log(f"first run (incl. compile): {time.time()-t0:.1f}s; out {img.shape} {img.dtype}")

    runs = 3
    times = []
    for i in range(runs):
        t0 = time.time()
        img = fn(params, tokens, uncond, jax.random.PRNGKey(2 + i))
        img.block_until_ready()
        times.append(time.time() - t0)
        log(f"run {i}: {times[-1]:.3f}s ({BATCH/times[-1]:.3f} img/s)")

    best = min(times)
    img_per_s = BATCH / best
    log(f"p50 per-image latency: {sorted(times)[len(times)//2]/BATCH*1000:.1f} ms")
    log(f"total bench wall: {time.time()-t_start:.1f}s")

    print(json.dumps({
        "metric": "sd2_txt2img_512_ddim50_img_per_s_per_chip",
        "value": round(img_per_s, 4),
        "unit": "img/s/chip",
        "vs_baseline": round(img_per_s / 2.0, 4),
    }))


if __name__ == "__main__":
    main()
