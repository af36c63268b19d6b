"""Training-step throughput on one TPU chip: SD2 finetune (eps-MSE).

The reference's only numeric perf table is train-side (wukong README.md:217-220
— LoRA vs full finetune time/epoch + device memory on a 910). This measures
our equivalent: steps/s and train-img/s for
  * lora: q/k/v/out LoRA adapters trainable (reference run_train.py:171-174)
  * full: whole UNet trainable (frozen VAE/CLIP, as the reference finetune)

Latent-cached batches (the loader can pre-encode; VAE encode is not the
number under test) + tokenized text. Usage:
  python benchmarks/bench_train_step.py [lora|full] [batch]
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

from minddiffusion_tpu.pipelines.stable_diffusion import SDModels  # noqa: E402
from minddiffusion_tpu.train.trainer import (  # noqa: E402
    TrainConfig, create_train_state, make_train_step)


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "lora"
    batch_size = int(sys.argv[2]) if len(sys.argv) > 2 else (8 if mode == "lora" else 2)

    models = SDModels.create(family="sd2", dtype=jnp.bfloat16,
                             enable_lora=(mode == "lora"),
                             attn_impl="pallas")
    params = jax.jit(lambda r: models.init_params(r, height=512, width=512))(
        jax.random.PRNGKey(0))
    jax.block_until_ready(params)

    cfg = TrainConfig(trainable=("lora" if mode == "lora" else "unet"))
    state = create_train_state(models, params, cfg)
    jax.block_until_ready(state.params)

    step = jax.jit(make_train_step(models, cfg), donate_argnums=(0,))
    batch = {
        "latent": jnp.asarray(
            np.random.RandomState(0).randn(batch_size, 64, 64, 4), jnp.float32),
        "tokens": jnp.ones((batch_size, 77), jnp.int32),
    }
    rng = jax.random.PRNGKey(1)

    t0 = time.time()
    state, metrics = step(state, batch, rng)
    np.asarray(metrics["loss"])
    print(f"[{mode} b{batch_size}] compile+first: {time.time()-t0:.1f}s "
          f"loss={float(metrics['loss']):.4f} "
          f"finite={float(metrics['grads_finite'])}", file=sys.stderr)

    times = []
    for i in range(6):
        t0 = time.time()
        state, metrics = step(state, batch, rng)
        np.asarray(metrics["loss"])
        times.append(time.time() - t0)
    best = min(times)
    print(f"[{mode} b{batch_size}] {best*1000:.1f} ms/step  "
          f"{batch_size/best:.2f} train-img/s  "
          f"(runs {[f'{t:.3f}' for t in times]})")


if __name__ == "__main__":
    main()
