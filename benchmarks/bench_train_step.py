"""Training-step throughput on one TPU chip: SD2 finetune (eps-MSE).

The reference's only numeric perf table is train-side (wukong README.md:217-220
— LoRA vs full finetune time/epoch + device memory on a 910). This measures
our equivalent: steps/s and train-img/s for
  * lora: q/k/v/out LoRA adapters trainable (reference run_train.py:171-174)
  * full: whole UNet trainable (frozen VAE/CLIP, as the reference finetune)
  * dreambooth: the wukong DreamBooth double-loss step (train + prior-reg,
    b1, sd1-family UNet — reference run_db_train.py + train_db_config.json:
    b1, 100 repeats, 5 epochs), printing the implied wall-clock for the
    reference's 25-35 min / 3-5 photo personalization claim (README.md:90)

Latent-cached batches (the loader can pre-encode; VAE encode is not the
number under test) + tokenized text. Usage:
  python benchmarks/bench_train_step.py [lora|full] [batch]
  python benchmarks/bench_train_step.py fsdp_mem    # no TPU needed

`fsdp_mem` prints the per-device param/optimizer HBM table for the full-scale
SD2 train state across FSDP degrees (abstract eval_shape + the live sharding
rules from parallel/mesh.py — exact byte math, no arrays materialized). This
is the memory-scaling record explaining the measured single-chip result
(full-finetune b8 OOMs one 16 GB v5e at fsdp=1, r3 queue log).
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


def _tree_bytes(tree) -> int:
    return sum(int(np.prod(getattr(l, "shape", ()))) * np.dtype(l.dtype).itemsize
               for l in jax.tree.leaves(tree)
               if hasattr(l, "dtype") and getattr(l, "shape", None) is not None)


def fsdp_mem_report():
    """Per-device param/optimizer bytes vs FSDP degree (abstract, CPU-only)."""
    import types

    jax.config.update("jax_platforms", "cpu")
    from minddiffusion_tpu.parallel import mesh as mesh_lib

    models = SDModels.create(family="sd2", dtype=jnp.bfloat16)
    params = jax.eval_shape(
        lambda r: models.init_params(r, height=512, width=512),
        jax.random.PRNGKey(0))
    cfg = TrainConfig(trainable="unet")
    state = jax.eval_shape(lambda p: create_train_state(models, p, cfg), params)

    def per_device(tree, fsdp):
        mesh = types.SimpleNamespace(shape={"dp": 8 // fsdp, "fsdp": fsdp, "tp": 1})
        total = 0
        for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
            shape = getattr(leaf, "shape", None)
            if shape is None or not hasattr(leaf, "dtype"):
                continue
            nbytes = int(np.prod(shape)) * np.dtype(leaf.dtype).itemsize
            spec = mesh_lib._param_spec(mesh_lib._path_str(path), leaf, mesh)
            div = 1
            for ax in spec:
                if ax is not None:
                    div *= mesh.shape[ax]
            total += -(-nbytes // div)
        return total

    gib = 1024 ** 3
    print(f"full-scale SD2 train state (trainable=unet, fp32 master+adam):")
    print(f"  params total        {_tree_bytes(state.params)/gib:.2f} GiB")
    print(f"  optimizer state     {_tree_bytes(state.opt_state)/gib:.2f} GiB")
    for fsdp in (1, 2, 4, 8):
        p = per_device(state.params, fsdp)
        o = per_device(state.opt_state, fsdp)
        print(f"  fsdp={fsdp}: per-device params {p/gib:.2f} GiB + opt "
              f"{o/gib:.2f} GiB = {(p+o)/gib:.2f} GiB")


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "lora"
    if mode == "fsdp_mem":
        fsdp_mem_report()
        return
    dreambooth = mode == "dreambooth"
    batch_size = int(sys.argv[2]) if len(sys.argv) > 2 else (
        8 if mode == "lora" else 1 if dreambooth else 2)

    models = SDModels.create(family=("wukong" if dreambooth else "sd2"),
                             dtype=jnp.bfloat16,
                             enable_lora=(mode == "lora"),
                             attn_impl="pallas")
    params = jax.jit(lambda r: models.init_params(r, height=512, width=512))(
        jax.random.PRNGKey(0))
    jax.block_until_ready(params)

    cfg = TrainConfig(trainable=("lora" if mode == "lora" else "unet"))
    state = create_train_state(models, params, cfg)
    jax.block_until_ready(state.params)
    gib = 1024 ** 3
    print(f"[{mode} b{batch_size}] params {_tree_bytes(state.params)/gib:.2f} GiB"
          f" + opt state {_tree_bytes(state.opt_state)/gib:.2f} GiB HBM",
          file=sys.stderr)

    step = jax.jit(make_train_step(models, cfg, dreambooth=dreambooth),
                   donate_argnums=(0,))
    batch = {
        "latent": jnp.asarray(
            np.random.RandomState(0).randn(batch_size, 64, 64, 4), jnp.float32),
        "tokens": jnp.ones((batch_size, 77), jnp.int32),
    }
    if dreambooth:
        batch["reg_latent"] = jnp.asarray(
            np.random.RandomState(1).randn(batch_size, 64, 64, 4), jnp.float32)
        batch["reg_tokens"] = jnp.ones((batch_size, 77), jnp.int32)
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
    if dreambooth:
        # reference recipe (train_db_config.json): photos x 100 repeats x
        # 5 epochs at b1 => 1500-2500 double-loss steps for 3-5 photos
        for photos in (3, 5):
            steps = photos * 100 * 5
            print(f"[dreambooth] {photos} photos -> {steps} steps "
                  f"-> {steps*best/60:.1f} min on one v5e "
                  f"(reference claim: 25-35 min, wukong README.md:90)")


if __name__ == "__main__":
    main()
