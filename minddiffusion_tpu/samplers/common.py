"""Shared sampler plumbing.

Every sampler in this package is a *pure function* of the form

    x_0 = sample(eps_fn, x_T, ...static schedule args..., key=...)

whose entire step loop is a single `lax.scan` — one XLA program per denoise
run, in contrast to the reference's host loop of per-step graph launches
(plms.py:151-177, main_funcs.py:36-69). All per-step scalars (timesteps,
alphas, sigmas, solver coefficients) are precomputed host-side in fp64 numpy
and handed to the scan as stacked fp32/int32 arrays; the scan body does only
gathers, the model call, and fused elementwise math.

`eps_fn(x, t) -> eps` is the (already CFG-wrapped, see core/cfg.py) denoiser.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

EpsFn = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]


def per_step_keys(key: Optional[jax.Array], n) -> jnp.ndarray:
    """`n` (an int or a shape tuple) independent PRNG keys, scannable on the
    leading axis. Works for BOTH legacy (2,) uint32 keys (split returns
    (*n, 2) uint32) and new-style typed keys (split returns a (*n,) key
    array) — callers must index, never reshape, the trailing key dims.

    A sampler that never adds noise (eta=0 DDIM, PLMS, DPM-Solver) may pass
    key=None; we still need an array for scan shape-uniformity.
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    return jax.random.split(key, n)


def broadcast_t(t_scalar: jnp.ndarray, batch: int) -> jnp.ndarray:
    """Per-step scalar timestep -> batch-1 (1,) vector for the model.

    Every sampler step uses ONE timestep for the whole batch, so the model's
    time-embedding chain (sinusoid -> 2-layer MLP -> per-resblock emb
    projections, ~20 small GEMMs per UNet step) runs at batch 1 and
    broadcasts against the (B, H, W, C) activations — numerically identical
    to the (B,)-replicated form, measurably cheaper inside the 50-step scan.
    Table gathers (jnp.take(table, t)[:, None, None, None]) broadcast the
    same way. `batch` is kept for call-site clarity/debug, unused."""
    del batch
    return jnp.broadcast_to(t_scalar, (1,))


def masked_blend_fn(
    mask: Optional[jnp.ndarray],
    x0: Optional[jnp.ndarray],
    sqrt_ac: jnp.ndarray,
    sqrt_1mac: jnp.ndarray,
):
    """Returns blend(x, t, key): latent-inpaint keep-region blending, or identity.

    Per step: x <- q_sample(x0, t)*mask + x*(1-mask), where mask==1 marks the
    kept (known) region (reference plms.py:151-159).
    `sqrt_ac`/`sqrt_1mac` are full (T,) tables indexed by the original t.
    """
    if mask is None:
        return lambda x, t, key: x

    def blend(x, t, key):
        noise = jax.random.normal(key, x0.shape, dtype=jnp.float32)
        a = jnp.take(sqrt_ac, t)[:, None, None, None]
        s = jnp.take(sqrt_1mac, t)[:, None, None, None]
        x0_noised = a * x0 + s * noise
        return x0_noised * mask + x * (1.0 - mask)

    return blend


def as_f32(x) -> np.ndarray:
    """Host-side fp32 table. Deliberately numpy, not jnp: sampler table
    construction must stay host-side so `sample(...)` can be called inside an
    outer jit (jnp constants created during tracing become tracers and break
    later numpy math)."""
    return np.asarray(x, dtype=np.float32)


def as_i32(x) -> np.ndarray:
    return np.asarray(x, dtype=np.int32)
