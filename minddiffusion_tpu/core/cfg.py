"""Classifier-free guidance, folded onto the batch axis inside jit.

The reference performs CFG by concatenating (uncond, cond) on the batch axis
per sampler step on the host (stablediffusionv2/ldm/models/diffusion/plms.py:190-197,
Taichu-GLIDE guider.py:36-86). We keep the same batch-axis fold — it is ideal
for the MXU (one big batched matmul) — but it happens *inside* the jitted scan,
so the doubled batch exists only on-device.

Convention: the folded batch is [uncond; cond] (uncond first), matching the
reference's `concat((uc, c))` ordering. `interleave=True` switches every
helper to the per-sample pair layout [u0, c0, u1, c1, ...] instead — the
guided output is identical, but each sample's pair stays on its own shard
under data-parallel mesh serving (a halves concat along a dp-sharded batch
axis lowers to an all-to-all INSIDE the sampler scan, and the halves split
in `guide` to a second one; tests/test_serving_hlo.py pins the program
collective-free).
"""
from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp

Pytree = Any


def fold(uncond: Pytree, cond: Pytree, interleave: bool = False) -> Pytree:
    """Fold two conditioning pytrees onto the leading (batch) axis."""
    if interleave:
        return jax.tree.map(
            lambda u, c: jnp.stack([u, c], axis=1).reshape(
                (2 * u.shape[0],) + u.shape[1:]), uncond, cond)
    return jax.tree.map(lambda u, c: jnp.concatenate([u, c], axis=0), uncond, cond)


def duplicate(x: jnp.ndarray, interleave: bool = False) -> jnp.ndarray:
    """Feed a batch tensor to both guidance branches, in the fold layout."""
    if interleave:
        return jnp.repeat(x, 2, axis=0)
    return jnp.concatenate([x, x], axis=0)


def guide(eps_folded: jnp.ndarray, scale: jnp.ndarray | float,
          interleave: bool = False) -> jnp.ndarray:
    """Unfold a folded model output and blend:
    eps = eps_uncond + scale * (eps_cond - eps_uncond).
    """
    if interleave:
        pair = eps_folded.reshape((-1, 2) + eps_folded.shape[1:])
        eps_uncond, eps_cond = pair[:, 0], pair[:, 1]
    else:
        eps_uncond, eps_cond = jnp.split(eps_folded, 2, axis=0)
    return eps_uncond + scale * (eps_cond - eps_uncond)


def wrap_model(
    apply_fn: Callable[[jnp.ndarray, jnp.ndarray, Pytree], jnp.ndarray],
    folded_cond: Pytree,
    scale: float,
    dedup: bool = False,
    interleave: bool = False,
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
        t2 = t if t.shape[0] == 1 else duplicate(t, interleave)
        if dedup:
            eps2 = apply_fn(x, t, folded_cond)
        else:
            eps2 = apply_fn(duplicate(x, interleave), t2, folded_cond)
        return guide(eps2, scale, interleave)

    return guided


def cfg_dup(x: jnp.ndarray, mode) -> jnp.ndarray:
    """Duplicate a batch tensor to both guidance halves in the fold layout
    named by a truthy cfg_fold `mode` (True -> halves, "interleave" -> pairs).
    Used by the UNet cfg-dedup handoff points (models/unet, models/attention)
    so the in-network duplications match wrap_model's fold layout."""
    return duplicate(x, interleave=(mode == "interleave"))
