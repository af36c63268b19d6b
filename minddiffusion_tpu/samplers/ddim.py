"""DDIM sampler as one `lax.scan` program.

Math follows Song et al. (arXiv:2010.02502) with the reference's table
conventions (stablediffusionv2/ldm/modules/diffusionmodules/util.py:134-162):
timesteps = range(0, T, T//S) + 1, alpha_prev shifted with alphas_cumprod[0]
prepended, sigma = eta * sqrt((1-a_prev)/(1-a) * (1-a/a_prev)).

Supports:
  * eta > 0 (stochastic DDIM),
  * img2img: pass `t_start_index` < num_steps to begin at an intermediate step
    of the subsequence (the caller q_samples the init latent to that step),
  * latent inpainting via (mask, x0) blending each step.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from minddiffusion_tpu.core.schedules import (
    DiffusionSchedule,
    ddim_sampling_parameters,
    make_ddim_timesteps,
)
from minddiffusion_tpu.samplers import common


def build_tables(
    schedule: DiffusionSchedule,
    num_steps: int,
    eta: float = 0.0,
    method: str = "uniform",
):
    """Host-side: per-step (t, a, a_prev, sigma) in *descending* t order."""
    ac = np.asarray(schedule.alphas_cumprod, dtype=np.float64)
    ts = make_ddim_timesteps(num_steps, schedule.num_timesteps, method)
    sigmas, alphas, alphas_prev = ddim_sampling_parameters(ac, ts, eta)
    # Sampling iterates from t_max down to t_min.
    rev = slice(None, None, -1)
    return dict(
        t=common.as_i32(ts[rev].copy()),
        alpha=common.as_f32(alphas[rev].copy()),
        alpha_prev=common.as_f32(alphas_prev[rev].copy()),
        sigma=common.as_f32(sigmas[rev].copy()),
    )


def sample(
    eps_fn: common.EpsFn,
    x_T: jnp.ndarray,
    schedule: DiffusionSchedule,
    num_steps: int = 50,
    eta: float = 0.0,
    key: Optional[jax.Array] = None,
    mask: Optional[jnp.ndarray] = None,
    x0: Optional[jnp.ndarray] = None,
    t_start_index: Optional[int] = None,
    method: str = "uniform",
) -> jnp.ndarray:
    """Run the full DDIM chain; returns the final latent (fp32).

    `t_start_index`: number of steps actually run (from that subsequence index
    down to 0), for img2img strength < 1. None means all `num_steps`.
    """
    tables = build_tables(schedule, num_steps, eta, method)
    start = num_steps - (t_start_index if t_start_index is not None else num_steps)
    tables = {k: v[start:] for k, v in tables.items()}
    n = int(tables["t"].shape[0])

    keys = common.per_step_keys(key, (n, 2))  # typed-key safe
    blend = common.masked_blend_fn(
        mask, x0, schedule.sqrt_alphas_cumprod, schedule.sqrt_one_minus_alphas_cumprod
    )
    batch = x_T.shape[0]

    def step(x, per_step):
        t, a_t, a_prev, sigma_t, ks = per_step
        tb = common.broadcast_t(t, batch)
        x = blend(x, tb, ks[0])
        eps = eps_fn(x, tb).astype(jnp.float32)
        x = x.astype(jnp.float32)
        sqrt_1ma = jnp.sqrt(1.0 - a_t)
        pred_x0 = (x - sqrt_1ma * eps) / jnp.sqrt(a_t)
        dir_xt = jnp.sqrt(jnp.maximum(1.0 - a_prev - sigma_t**2, 0.0)) * eps
        noise = sigma_t * jax.random.normal(ks[1], x.shape, dtype=jnp.float32)
        x_prev = jnp.sqrt(a_prev) * pred_x0 + dir_xt + noise
        return x_prev, None

    xs = (tables["t"], tables["alpha"], tables["alpha_prev"], tables["sigma"], keys)
    x_final, _ = jax.lax.scan(step, x_T.astype(jnp.float32), xs)
    return x_final
