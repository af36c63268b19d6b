"""Latent-diffusion training: loss, TrainState, and the pjit'd train step.

The whole reference L2 layer (SURVEY.md §2.1) collapses here:
  * `ParallelTrainOneStepWithLossScaleCell` (cell_wrapper.py:42-234) — gone.
    bf16 on TPU needs no dynamic loss scaling (fp16-era machinery); the
    overflow monitor is replaced by a `grads_finite` metric.
  * grad_reducer AllReduce (cell_wrapper.py:183) + global-norm AllReduce
    (utils.py:158) — implicit: the step is jitted over a Mesh with the batch
    sharded on ("dp","fsdp"), so XLA emits the psum/reduce-scatter itself.
  * Loss (ddpm.py:316-344): t ~ U[0,T), z = stop_grad(0.18215 * VAE-sample),
    eps-MSE. DreamBooth's paired train+reg double loss (wukong
    ddpm.py:319-337) is `make_train_step(..., dreambooth=True)`.

Functional surface: `step_fn(state, batch, rng) -> (state, metrics)`; callers
jit it with shardings from parallel.mesh.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from minddiffusion_tpu.core import distributions, latents
from minddiffusion_tpu.pipelines.stable_diffusion import SDModels
from minddiffusion_tpu.train.lr_schedules import warmup_then_decay
from minddiffusion_tpu.train.optim import build_optimizer


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Defaults mirror configs/train_config.json (betas .9/.98, lr 1e-5→1e-7,
    warmup 1000, wd 1e-6 on decay group)."""

    start_lr: float = 1e-5
    end_lr: float = 1e-7
    warmup_steps: int = 1000
    decay_steps: int = 100_000
    use_cosine: bool = True
    beta1: float = 0.9
    beta2: float = 0.98
    weight_decay: float = 1e-6
    max_grad_norm: float = 1.0
    trainable: str = "unet"
    cond_dropout: float = 0.0  # CFG text dropout (GLIDE trains with 0.2)
    prior_loss_weight: float = 1.0  # DreamBooth reg weight


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    apply_fns: Any = struct.field(pytree_node=False)

    def apply_gradients(self, grads):
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        return self.replace(
            step=self.step + 1,
            params=optax.apply_updates(self.params, updates),
            opt_state=new_opt,
        )


def create_train_state(models: SDModels, params, config: TrainConfig) -> TrainState:
    lr = warmup_then_decay(config.start_lr, config.end_lr, config.warmup_steps,
                           config.decay_steps, use_cosine=config.use_cosine)
    tx = build_optimizer(
        params, lr, weight_decay=config.weight_decay, beta1=config.beta1,
        beta2=config.beta2, max_grad_norm=config.max_grad_norm,
        trainable=config.trainable,
    )
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        tx=tx,
        apply_fns=models,
    )


def diffusion_loss(
    models: SDModels,
    params,
    images: Optional[jnp.ndarray],  # (B,H,W,3) fp32 in [-1,1], or None
    tokens: jnp.ndarray,            # (B,L) int32
    rng: jax.Array,
    cond_dropout: float = 0.0,
    latent: Optional[jnp.ndarray] = None,  # pre-encoded (B,h,w,4), already scaled
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """eps-MSE latent diffusion loss (ddpm.py p_losses, 'l_simple').

    Two input modes: raw `images` (VAE encode inside the graph, as the
    reference does) or precomputed `latent` (latent-cached training — the VAE
    is frozen anyway, so encoding once offline removes it from every train
    step's forward AND compile).
    """
    k_enc, k_t, k_noise, k_drop = jax.random.split(rng, 4)
    if latent is not None:
        z0 = latent
        b = latent.shape[0]
    else:
        b = images.shape[0]
        moments = models.vae.apply(params["vae"], images, method=models.vae.encode)
        z0 = latents.scale_latents(distributions.sample(k_enc, moments), models.scale_factor)
        z0 = jax.lax.stop_gradient(z0)  # first stage frozen (ddpm.py:308-319)

    ctx = models.text_encoder.apply(params["text"], tokens)
    if cond_dropout > 0.0:
        # GLIDE-style CFG training: zero the context for a random subset
        # (image_datasets.py:287-289 drops text -> empty tokens; zeroed
        # context is the embedding-space equivalent)
        keep = jax.random.bernoulli(k_drop, 1.0 - cond_dropout, (b, 1, 1))
        ctx = ctx * keep.astype(ctx.dtype)

    t = jax.random.randint(k_t, (b,), 0, models.schedule.num_timesteps)
    noise = jax.random.normal(k_noise, z0.shape, jnp.float32)
    x_t = models.schedule.q_sample(z0, t, noise)
    eps_hat = models.unet.apply(params["unet"], x_t, t, ctx)

    mse = jnp.mean(jnp.square(eps_hat.astype(jnp.float32) - noise), axis=(1, 2, 3))
    loss = jnp.mean(mse)
    return loss, {"loss": loss, "mse_t_mean": jnp.mean(t.astype(jnp.float32))}


def make_train_step(
    models: SDModels,
    config: TrainConfig,
    dreambooth: bool = False,
) -> Callable:
    """Returns step(state, batch, rng) -> (state, metrics).

    batch: {"image": (B,H,W,3) f32, "tokens": (B,L) i32} — or
    {"latent": (B,h,w,4) f32, "tokens"} for latent-cached training — plus
    {"reg_image"/"reg_latent", "reg_tokens"} when dreambooth=True (wukong
    ddpm.py:319-337: loss = loss_train + prior_loss_weight * loss_reg).
    """

    def loss_fn(params, batch, rng):
        r1, r2 = jax.random.split(rng)
        loss, metrics = diffusion_loss(
            models, params, batch.get("image"), batch["tokens"], r1,
            cond_dropout=config.cond_dropout, latent=batch.get("latent"),
        )
        if dreambooth:
            reg_loss, _ = diffusion_loss(
                models, params, batch.get("reg_image"), batch["reg_tokens"], r2,
                latent=batch.get("reg_latent"),
            )
            metrics["train_loss"] = loss
            metrics["reg_loss"] = reg_loss
            loss = loss + config.prior_loss_weight * reg_loss
            metrics["loss"] = loss
        return loss, metrics

    def step(state: TrainState, batch, rng):
        # fold the step index so every step draws fresh noise deterministically
        rng = jax.random.fold_in(rng, state.step)
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, rng
        )
        # NaN/Inf guard replaces the reference's float-status overflow skip
        # (cell_wrapper.py:191-197): skip the update if any grad is non-finite.
        finite = jnp.all(
            jnp.asarray([jnp.all(jnp.isfinite(g)) for g in jax.tree.leaves(grads)])
        )
        grads = jax.tree.map(lambda g: jnp.where(finite, g, 0.0), grads)
        new_state = state.apply_gradients(grads)
        new_state = jax.tree.map(
            lambda new, old: jnp.where(finite, new, old), new_state, state
        )
        metrics["grads_finite"] = finite.astype(jnp.float32)
        metrics["grad_norm"] = optax.global_norm(grads)
        return new_state.replace(step=state.step + 1), metrics

    return step
