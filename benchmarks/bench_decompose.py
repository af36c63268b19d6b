"""Decompose SD2 txt2img wall time: pipeline slope vs component slopes.

Wall(steps) = fixed + steps * per_step. Measures the full pipeline at two
step counts, then the UNet denoise step, VAE decode and CLIP encode in
isolation (scan-amortized, slope-timed).
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


def force(x):
    leaf = jax.tree.leaves(x)[0]
    np.asarray(leaf[(0,) * leaf.ndim])


def timeit(call):
    call()  # compile
    ts = []
    for _ in range(3):
        t0 = time.perf_counter(); call(); ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    models = SDModels.create(family="sd2", dtype=jnp.bfloat16)
    params = jax.jit(lambda r: models.init_params(r, height=512, width=512))(
        jax.random.PRNGKey(0))
    jax.block_until_ready(params)
    pipe = StableDiffusionPipeline(models)
    tokens = jnp.ones((8, 77), jnp.int32)
    uncond = jnp.zeros((8, 77), jnp.int32)

    walls = {}
    for steps in (10, 50):
        fn = pipe.build_txt2img(height=512, width=512, num_steps=steps,
                                sampler="ddim", guidance_scale=9.0, batch_size=8)
        walls[steps] = timeit(lambda: force(fn(params, tokens, uncond,
                                               jax.random.PRNGKey(1))))
        print(f"pipeline {steps} steps: {walls[steps]:.3f}s", flush=True)
    slope = (walls[50] - walls[10]) / 40
    print(f"pipeline slope: {slope*1e3:.1f} ms/step; fixed: "
          f"{walls[10] - 10*slope:.3f}s", flush=True)

    # UNet-only scan
    rng = jax.random.PRNGKey(2)
    x = jax.random.normal(rng, (16, 64, 64, 4), jnp.float32)
    ctx = jax.random.normal(rng, (16, 77, 1024), jnp.bfloat16)
    uparams = params["unet"]

    def unet_scan(steps):
        def body(h, t):
            eps = models.unet.apply(uparams, h, jnp.full((16,), t, jnp.int32), ctx)
            return eps.astype(h.dtype), ()
        return jax.jit(lambda x0: jax.lax.scan(
            body, x0, jnp.arange(steps, dtype=jnp.int32))[0])

    t10 = timeit(lambda: force(unet_scan(10)(x)))
    t50 = timeit(lambda: force(unet_scan(50)(x)))
    print(f"unet-only: 10={t10:.3f}s 50={t50:.3f}s slope "
          f"{(t50-t10)/40*1e3:.1f} ms/step", flush=True)

    # VAE decode alone
    z = jax.random.normal(rng, (8, 64, 64, 4), jnp.float32)
    vparams = params["vae"]
    dec = jax.jit(lambda z_: models.vae.apply(vparams, z_,
                                              method=models.vae.decode))
    t = timeit(lambda: force(dec(z)))
    print(f"vae decode (b8 512px): {t*1e3:.1f} ms (incl ~31ms call floor)",
          flush=True)

    # CLIP encode (CFG-folded 16)
    tok16 = jnp.ones((16, 77), jnp.int32)
    cparams = params["text"]
    enc = jax.jit(lambda tt: models.text_encoder.apply(cparams, tt))
    t = timeit(lambda: force(enc(tok16)))
    print(f"clip encode (b16): {t*1e3:.1f} ms (incl floor)", flush=True)


if __name__ == "__main__":
    main()
