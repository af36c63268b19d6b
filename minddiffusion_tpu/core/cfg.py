"""Classifier-free guidance, folded onto the batch axis inside jit.

The reference performs CFG by concatenating (uncond, cond) on the batch axis
per sampler step on the host (stablediffusionv2/ldm/models/diffusion/plms.py:190-197,
Taichu-GLIDE guider.py:36-86). We keep the same batch-axis fold — it is ideal
for the MXU (one big batched matmul) — but it happens *inside* the jitted scan,
so the doubled batch exists only on-device.

Convention: the folded batch is [uncond; cond] (uncond first), matching the
reference's `concat((uc, c))` ordering.
"""
from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp

Pytree = Any


def fold(uncond: Pytree, cond: Pytree) -> Pytree:
    """Concatenate two conditioning pytrees on the leading (batch) axis."""
    return jax.tree.map(lambda u, c: jnp.concatenate([u, c], axis=0), uncond, cond)


def duplicate(x: jnp.ndarray) -> jnp.ndarray:
    """Tile a batch tensor 2x on the leading axis (x_t fed to both branches)."""
    return jnp.concatenate([x, x], axis=0)


def guide(eps_folded: jnp.ndarray, scale: jnp.ndarray | float) -> jnp.ndarray:
    """Split a folded [uncond; cond] model output and blend:
    eps = eps_uncond + scale * (eps_cond - eps_uncond).
    """
    eps_uncond, eps_cond = jnp.split(eps_folded, 2, axis=0)
    return eps_uncond + scale * (eps_cond - eps_uncond)


def wrap_model(
    apply_fn: Callable[[jnp.ndarray, jnp.ndarray, Pytree], jnp.ndarray],
    folded_cond: Pytree,
    scale: float,
    dedup: bool = False,
) -> Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]:
    """Turn an (x, t, cond)->eps model into a guided (x, t)->eps model.

    `folded_cond` must already be [uncond; cond] with batch 2B; `x` and `t`
    have batch B and are duplicated internally. With scale == 1.0 guidance
    reduces to the conditional branch but we still run both halves — keeping
    the traced program shape-stable across scales.

    `dedup=True`: apply_fn receives x/t at batch B (NOT duplicated) and must
    return a 2B [uncond; cond] output itself — the UNet cfg_fold path, which
    runs the network prefix once instead of twice (models/unet.py).
    """

    def guided(x: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
        # a batch-1 t broadcasts against either half (samplers.common
        # broadcast_t); only a full-batch t needs the explicit duplicate
        t2 = t if t.shape[0] == 1 else duplicate(t)
        if dedup:
            eps2 = apply_fn(x, t, folded_cond)
        else:
            eps2 = apply_fn(duplicate(x), t2, folded_cond)
        return guide(eps2, scale)

    return guided
