"""Training CLI — surface mirrors the reference trainer
(stablediffusionv2/run_train.py:212-243 + configs/train_config.json), with
DreamBooth (`--train_mode dreambooth`, run_db_train.py) and LoRA
(`--train_mode lora`, wukong run_train.py:171-174) folded in. Distribution is
mesh-based: `--dp/--fsdp` axes instead of RANK_TABLE_FILE launch scripts.

    python -m minddiffusion_tpu.cli.train --data_path /data --config cfg.json
"""
from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp

from minddiffusion_tpu.cli import common
from minddiffusion_tpu.data import DreamBoothDataset, load_data
from minddiffusion_tpu.io.checkpoints import CheckpointManager
from minddiffusion_tpu.parallel import mesh as mesh_lib
from minddiffusion_tpu.train import (TrainConfig, create_train_state,
                                     lora_checkpoint_transform, make_train_step)
from minddiffusion_tpu.train.loop import LossMonitor, ProfilerCallback, Trainer
from minddiffusion_tpu.utils import xla_opts
from minddiffusion_tpu.utils.config import parse_with_config, set_random_seed
from minddiffusion_tpu.utils.logger import configure


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="TPU-native SD training")
    p.add_argument("--config", type=str, default=None,
                   help="JSON overlay for unset flags (train_config.json semantics)")
    p.add_argument("--data_path", type=str, default=None,
                   help="CSV-manifest dir; required unless --train_mode "
                        "dreambooth (which uses --instance/--class_data_dir)")
    p.add_argument("--output_path", type=str, default="output/train")
    p.add_argument("--family", choices=["sd2", "wukong"], default="wukong")
    p.add_argument("--pretrained_ckpt", type=str, default=None)
    p.add_argument("--train_mode", choices=["finetune", "dreambooth", "lora"],
                   default="finetune")
    p.add_argument("--train_batch_size", type=int, default=3)
    p.add_argument("--image_size", type=int, default=512)
    p.add_argument("--image_filter_size", type=int, default=256)
    p.add_argument("--random_crop", action="store_true")
    p.add_argument("--epochs", type=int, default=20)
    p.add_argument("--max_steps", type=int, default=None)
    p.add_argument("--start_learning_rate", type=float, default=1e-5)
    p.add_argument("--end_learning_rate", type=float, default=1e-7)
    p.add_argument("--warmup_steps", type=int, default=1000)
    p.add_argument("--decay_steps", type=int, default=100000)
    p.add_argument("--weight_decay", type=float, default=1e-6)
    p.add_argument("--betas", type=float, nargs=2, default=[0.9, 0.98])
    p.add_argument("--seed", type=int, default=3407)
    p.add_argument("--save_checkpoint_steps", type=int, default=10000)
    p.add_argument("--keep_checkpoint_max", type=int, default=10)
    p.add_argument("--dp", type=int, default=-1)
    p.add_argument("--fsdp", type=int, default=1)
    p.add_argument("--dtype", choices=["bf16", "fp32"], default="bf16")
    p.add_argument("--debug_tiny", action="store_true",
                   help="miniature model for smoke tests (random weights)")
    p.add_argument("--enable_profiling", action="store_true")
    p.add_argument("--profile_start_step", type=int, default=10)
    p.add_argument("--profile_stop_step", type=int, default=13)
    # dreambooth extras (run_db_train.py)
    p.add_argument("--instance_data_dir", type=str, default=None)
    p.add_argument("--class_data_dir", type=str, default=None)
    p.add_argument("--token", type=str, default="sks")
    p.add_argument("--class_word", type=str, default="person")
    p.add_argument("--train_data_repeats", type=int, default=100)
    p.add_argument("--prior_loss_weight", type=float, default=1.0)
    return p


def main(argv=None):
    args = parse_with_config(build_parser(), argv)
    set_random_seed(args.seed)
    logger = configure(args.output_path, formats=("human", "json"))

    models = common.build_sd(args.family, args.dtype, tiny=args.debug_tiny,
                             enable_lora=args.train_mode == "lora")
    params = common.load_params(models, args.pretrained_ckpt, args.image_size,
                                args.image_size, args.seed)

    tokenizer = common.tokenizer_for(args.family)
    dreambooth = args.train_mode == "dreambooth"
    if not dreambooth and not args.data_path:
        raise SystemExit("--data_path is required unless --train_mode dreambooth")
    if dreambooth:
        assert args.instance_data_dir and args.class_data_dir
        dataset = DreamBoothDataset(
            args.instance_data_dir, args.class_data_dir, args.token,
            args.class_word, tokenizer.tokenize, args.train_batch_size,
            args.image_size, args.train_data_repeats, args.seed)
    else:
        dataset = load_data(
            args.data_path, args.train_batch_size, tokenizer.tokenize,
            image_size=args.image_size, image_filter_size=args.image_filter_size,
            random_crop=args.random_crop, seed=args.seed)

    config = TrainConfig(
        start_lr=args.start_learning_rate, end_lr=args.end_learning_rate,
        warmup_steps=args.warmup_steps, decay_steps=args.decay_steps,
        weight_decay=args.weight_decay, beta1=args.betas[0], beta2=args.betas[1],
        trainable="lora" if args.train_mode == "lora" else "unet",
        prior_loss_weight=args.prior_loss_weight)

    mesh = mesh_lib.make_mesh(mesh_lib.MeshConfig(dp=args.dp, fsdp=args.fsdp))
    state = create_train_state(models, params, config)
    state = jax.device_put(state, mesh_lib.param_shardings(state, mesh))
    step_fn = xla_opts.jit(make_train_step(models, config, dreambooth=dreambooth),
                           donate_argnums=(0,))

    callbacks = [LossMonitor(logger)]
    if args.enable_profiling:
        callbacks.append(ProfilerCallback(
            args.output_path, args.profile_start_step, args.profile_stop_step))

    # LoRA mode: periodic checkpoints hold only the adapter subtree, like the
    # reference's MindPet choice_func save filter (wukong run_train.py LoRA
    # branch) — restore by merge_params over pretrained base params.
    ckpt_transform = (lora_checkpoint_transform(params)
                      if args.train_mode == "lora" else None)

    trainer = Trainer(
        step_fn=step_fn,
        dataset=dataset,
        rng=jax.random.PRNGKey(args.seed),
        shard_batch=lambda b: mesh_lib.shard_batch(b, mesh),
        callbacks=callbacks,
        ckpt_manager=CheckpointManager(
            args.output_path + "/ckpt", args.save_checkpoint_steps,
            args.keep_checkpoint_max),
        ckpt_transform=ckpt_transform,
        max_steps=args.max_steps)
    state = trainer.fit(state, epochs=args.epochs)
    logger.logkv("final_step", int(jax.device_get(state.step)))
    logger.dumpkvs()
    return state


if __name__ == "__main__":
    main()
