"""LR schedules: linear warmup into cosine or polynomial decay.

Mirrors the reference's LearningRate cell semantics
(stablediffusionv2/ldm/modules/train/learningrate.py:27-64): during warmup,
lr ramps linearly 0 -> start_lr; afterwards, decays start_lr -> end_lr over
`decay_steps` by cosine (default) or polynomial(power). Expressed as a plain
optax-style schedule fn (host-free, works inside pjit'd update steps).
"""
from __future__ import annotations

import jax.numpy as jnp


def warmup_then_decay(
    start_lr: float,
    end_lr: float,
    warmup_steps: int,
    decay_steps: int,
    power: float = 1.0,
    use_cosine: bool = True,
):
    """Returns schedule(step) -> lr (fp32 scalar)."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        frac = jnp.clip(step / jnp.maximum(1.0, float(decay_steps)), 0.0, 1.0)
        if use_cosine:
            decayed = end_lr + 0.5 * (start_lr - end_lr) * (1 + jnp.cos(jnp.pi * frac))
        else:
            decayed = (start_lr - end_lr) * (1 - frac) ** power + end_lr
        if warmup_steps > 0:
            warm = start_lr * step / float(warmup_steps)
            return jnp.where(step < warmup_steps, warm, decayed)
        return decayed

    return schedule
