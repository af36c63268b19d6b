"""GLIDE finetune CLI — mirrors Taichu-GLIDE src/train_txt2img.py:49-197
(TSV manifests, text-dropout CFG training, per-sample (t, w) importance
sampling, VLB+MSE loss, AdamW, summary/profiler callbacks) on a (dp, fsdp)
mesh. Trains the base 64px model; `--super_res` trains the 256px upsampler.
"""
from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np
import optax

from minddiffusion_tpu.data.glide_dataset import GlideTextImageDataset, read_manifests
from minddiffusion_tpu.io.checkpoints import CheckpointManager
from minddiffusion_tpu.models.glide import GlideUNetConfig, SuperResText2ImUNet, Text2ImUNet, XfConfig
from minddiffusion_tpu.parallel import mesh as mesh_lib
from minddiffusion_tpu.train import lr_schedules, optim
from minddiffusion_tpu.train.glide_loss import glide_diffusion_loss
from minddiffusion_tpu.train.ema import init_ema, update_ema
from minddiffusion_tpu.train.loop import LossMonitor, ProfilerCallback
from minddiffusion_tpu.core.schedules import make_beta_schedule, respace_schedule
from minddiffusion_tpu.utils import xla_opts
from minddiffusion_tpu.utils.config import parse_with_config, set_random_seed
from minddiffusion_tpu.utils.logger import configure


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="TPU-native GLIDE finetuning")
    p.add_argument("--config", type=str, default=None)
    p.add_argument("--image_caption_path_file", type=str, required=True)
    p.add_argument("--output_path", type=str, default="output/glide-train")
    p.add_argument("--super_res", action="store_true")
    p.add_argument("--pretrained_ckpt", type=str, default=None, help="orbax dir")
    p.add_argument("--image_size", type=int, default=64)
    p.add_argument("--super_res_image_size", type=int, default=256)
    p.add_argument("--train_batch_size", type=int, default=2)
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--max_steps", type=int, default=None)
    p.add_argument("--lr", type=float, default=1e-5)
    p.add_argument("--warmup_steps", type=int, default=500)
    p.add_argument("--decay_steps", type=int, default=100000)
    p.add_argument("--text_drop_p", type=float, default=0.2)
    p.add_argument("--ema_decay", type=float, default=0.9999)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--dp", type=int, default=-1)
    p.add_argument("--fsdp", type=int, default=1)
    p.add_argument("--dtype", choices=["bf16", "fp32"], default="bf16")
    p.add_argument("--debug_tiny", action="store_true")
    p.add_argument("--enable_profiling", action="store_true")
    p.add_argument("--save_checkpoint_steps", type=int, default=5000)
    p.add_argument("--tokenizer_model", type=str, default=None,
                   help="sentencepiece model; hash-fallback tokens if absent")
    return p


def main(argv=None):
    args = parse_with_config(build_parser(), argv)
    set_random_seed(args.seed)
    logger = configure(args.output_path, formats=("human", "json"))
    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32

    if args.debug_tiny:
        ucfg = GlideUNetConfig(
            in_channels=6 if args.super_res else 3, model_channels=32,
            num_res_blocks=1, attention_resolutions=(2,), channel_mult=(1, 2),
            num_head_channels=16, dtype=dtype)
        xcfg = XfConfig(width=32, layers=2, heads=4, text_ctx=8, n_vocab=64,
                        dtype=dtype)
    else:
        ucfg = (GlideUNetConfig.upsample_256(dtype=dtype) if args.super_res
                else GlideUNetConfig.base_64(dtype=dtype))
        xcfg = XfConfig(dtype=dtype)

    if args.super_res:
        model = SuperResText2ImUNet(ucfg, xcfg)
        betas = make_beta_schedule("linear_plain", 1000)
        img_size = args.super_res_image_size
    else:
        model = Text2ImUNet(ucfg, xcfg)
        betas = make_beta_schedule("squaredcos_cap_v2", 1000)
        img_size = args.image_size
    schedule = respace_schedule(betas, set(range(1000)))

    ctx = xcfg.text_ctx
    rng = jax.random.PRNGKey(args.seed)
    toks0 = jnp.zeros((1, ctx), jnp.int32)
    mask0 = jnp.ones((1, ctx), jnp.int32)
    if args.super_res:
        low0 = jnp.zeros((1, args.image_size, args.image_size, 3))
        params = model.init(rng, jnp.zeros((1, img_size, img_size, 3)),
                            jnp.zeros((1,), jnp.int32), low0, toks0, mask0)
    else:
        params = model.init(rng, jnp.zeros((1, img_size, img_size, 3)),
                            jnp.zeros((1,), jnp.int32), toks0, mask0)
    if args.pretrained_ckpt:
        from minddiffusion_tpu.io.checkpoints import load_checkpoint

        params = load_checkpoint(args.pretrained_ckpt, target=params)

    lr = lr_schedules.warmup_then_decay(args.lr, args.lr * 0.01,
                                        args.warmup_steps, args.decay_steps)
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(lr))
    opt_state = tx.init(params)
    ema = init_ema(params)

    mesh = mesh_lib.make_mesh(mesh_lib.MeshConfig(dp=args.dp, fsdp=args.fsdp))
    shardings = mesh_lib.param_shardings((params, opt_state, ema), mesh)
    params, opt_state, ema = jax.device_put((params, opt_state, ema), shardings)

    def loss_model_fn(p):
        if args.super_res:
            return lambda x, t, tk, mk, low: model.apply(p, x, t, low, tk, mk)
        return lambda x, t, tk, mk: model.apply(p, x, t, tk, mk)

    @xla_opts.jit
    def step_fn(params, opt_state, ema, batch, rng):
        def loss_fn(p):
            fn = loss_model_fn(p)
            if args.super_res:
                mfn = lambda x, t, tk, mk: fn(x, t, tk, mk, batch["low_res"])
            else:
                mfn = fn
            return glide_diffusion_loss(
                mfn, schedule, batch["image"], batch["tokens"], batch["mask"],
                batch["t"], batch["weights"], rng)

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        ema = update_ema(ema, params, args.ema_decay)
        metrics["grad_norm"] = optax.global_norm(grads)
        return params, opt_state, ema, metrics

    if args.tokenizer_model:
        from minddiffusion_tpu.text.glide_text import (
            GlideSentencePieceTokenizer, padded_tokens_and_mask)

        sp = GlideSentencePieceTokenizer(args.tokenizer_model)

        def encode_and_pad(text):
            toks, msk = padded_tokens_and_mask(sp.encode(text), ctx, sp.end_token)
            return np.asarray(toks, np.int32), np.asarray(msk, np.int32)
    else:
        print("WARNING: no --tokenizer_model; using hash-fallback tokens")
        encode_and_pad = lambda text: _encode(text, ctx)

    pairs = read_manifests(args.image_caption_path_file)
    dataset = GlideTextImageDataset(
        pairs,
        encode_and_pad=encode_and_pad,
        batch_size=args.train_batch_size,
        image_size=img_size,
        text_drop_p=args.text_drop_p,
        seed=args.seed,
        shard_index=jax.process_index(),
        shard_count=jax.process_count(),
        super_res_size=args.image_size if args.super_res else None,
    )

    callbacks = [LossMonitor(logger)]
    if args.enable_profiling:
        callbacks.append(ProfilerCallback(args.output_path, 10, 13))
    ckpt = CheckpointManager(args.output_path + "/ckpt",
                             args.save_checkpoint_steps)
    step = 0
    rng = jax.random.PRNGKey(args.seed + 1)
    try:
        for epoch in range(args.epochs):
            for batch in dataset.epoch(epoch):
                batch = {k: mesh_lib.shard_batch(jnp.asarray(v), mesh)
                         for k, v in batch.items()}
                rng, sub = jax.random.split(rng)
                params, opt_state, ema, metrics = step_fn(
                    params, opt_state, ema, batch, sub)
                step += 1
                for cb in callbacks:
                    cb.on_step_end(step, jax.device_get(metrics))
                ckpt.maybe_save(step, {"params": params, "ema": ema})
                if args.max_steps and step >= args.max_steps:
                    raise StopIteration
    except StopIteration:
        pass
    finally:
        ckpt.wait_until_finished()
        ckpt.close()
    logger.logkv("final_step", step)
    logger.dumpkvs()
    return params, ema


def _encode(text: str, ctx: int, n_vocab: int = 50001):
    """Hash-fallback tokenizer so smoke runs work without a model file."""
    ids = [hash(w) % (n_vocab - 1) for w in text.split()][:ctx]
    pad = ctx - len(ids)
    return (np.asarray(ids + [n_vocab - 1] * pad, np.int32),
            np.asarray([1] * len(ids) + [0] * pad, np.int32))


if __name__ == "__main__":
    main()
