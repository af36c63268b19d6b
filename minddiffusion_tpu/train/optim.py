"""Optimizer factory: AdamW with decay/no-decay groups and trainable masking.

Parity with the reference's build_optimizer
(stablediffusionv2/ldm/modules/train/optim.py:21-51): no weight decay for
LayerNorm/GroupNorm scales and biases; AdamW betas (0.9, 0.98) from
train_config.json. Global-norm clipping is part of the chain (the reference
clips inside its loss-scale step cell with a distributed AllReduce,
utils.py:149-181 — here optax.global_norm under pjit psums automatically).

Trainable masking replaces the reference's param-freeze machinery:
  * "unet"      — train the denoiser only (cond/first stage frozen, matching
    cond_stage_trainable: false + VAE stop_grad, ddpm.py:308-319).
  * "lora"      — only params whose path contains "lora_" (MindPet
    freeze_delta equivalent, wukong run_train.py:171-174).
  * "all"       — everything.
"""
from __future__ import annotations

from typing import Any

import jax
import optax


def _path_str(path) -> str:
    return "/".join(str(getattr(k, "key", k)) for k in path).lower()


def trainable_mask(params, mode: str = "unet"):
    """Boolean pytree: True where the param receives gradient updates."""

    def decide(path, _leaf) -> bool:
        p = _path_str(path)
        if mode == "all":
            return True
        if mode == "unet":
            return p.startswith("unet") or "'unet'" in p
        if mode == "lora":
            return "lora_" in p
        if mode == "unet+text":
            return any(s in p for s in ("unet", "text"))
        raise ValueError(f"unknown trainable mode: {mode!r}")

    return jax.tree_util.tree_map_with_path(decide, params)


def decay_mask(params):
    """True where weight decay applies (not norm scales/biases/embeddings)."""

    def decide(path, leaf) -> bool:
        p = _path_str(path)
        if any(s in p for s in ("bias", "scale", "norm", "embedding")):
            return False
        return leaf.ndim >= 2

    return jax.tree_util.tree_map_with_path(decide, params)


def build_optimizer(
    params,
    learning_rate,
    weight_decay: float = 1e-6,
    beta1: float = 0.9,
    beta2: float = 0.98,
    eps: float = 1e-8,
    max_grad_norm: float = 1.0,
    trainable: str = "unet",
) -> optax.GradientTransformation:
    tx = optax.chain(
        optax.clip_by_global_norm(max_grad_norm),
        optax.adamw(
            learning_rate=learning_rate,
            b1=beta1,
            b2=beta2,
            eps=eps,
            weight_decay=weight_decay,
            mask=decay_mask(params),
        ),
    )
    mask = trainable_mask(params, trainable)
    frozen = jax.tree.map(lambda m: "train" if m else "freeze", mask)
    return optax.multi_transform(
        {"train": tx, "freeze": optax.set_to_zero()}, frozen
    )


def lora_checkpoint_transform(params):
    """params -> adapter-only subtree, for `Trainer(ckpt_transform=…)`.

    The reference's MindPet LoRA flow saves only adapter params (choice_func
    filtering); this is the equivalent filter, paired with
    `io.checkpoints.merge_params` over pretrained base params on restore.
    The mask is derived once, here, so the save-side predicate can't drift
    from `trainable_mask`'s freeze rule."""
    from minddiffusion_tpu.io.checkpoints import trainable_only

    mask = trainable_mask(params, "lora")
    return lambda p: trainable_only(p, mask)
