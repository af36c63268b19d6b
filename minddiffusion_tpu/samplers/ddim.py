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


def sample_fused_tail(
    features_fn,
    tail: dict,
    guidance_scale: float,
    x_T: jnp.ndarray,
    schedule: DiffusionSchedule,
    num_steps: int = 50,
    method: str = "uniform",
    t_start_index: Optional[int] = None,
) -> jnp.ndarray:
    """DDIM (eta=0, no mask blending) where the UNet tail (out_norm
    GroupNorm + SiLU + out_conv), the CFG guide over the [uncond; cond]
    halves, and the per-step update run as ONE Pallas pass
    (ops/glide_tail.sd_cfg_tail_step). With eta=0 the update is linear in
    (x, eps): x_prev = cA*x + cB*eps_guided, cA = sqrt(a_prev/a_t),
    cB = sqrt(1-a_prev) - sqrt(a_prev*(1-a_t)/a_t) — identical math to
    `sample` up to fp32-SiLU and tap-order reassociation (kernel docstring).

    `features_fn(x, t) -> (2B, H, W, C)` pre-tail features of the CFG-folded
    batch (halves layout; the interleaved mesh layout would need stride-2
    sublane slices and is rejected by sd_tail_route). Off-TPU the step falls
    back to an equivalent plain-XLA composition."""
    from minddiffusion_tpu.models.layers import gn_affine_from_sums
    from minddiffusion_tpu.ops import glide_tail
    from minddiffusion_tpu.utils.xla_opts import _tpu_platform

    tables = build_tables(schedule, num_steps, 0.0, method)
    start = num_steps - (t_start_index if t_start_index is not None else num_steps)
    tables = {k: v[start:] for k, v in tables.items()}
    batch = x_T.shape[0]
    w_eps = tail["kernel"]
    b_eps = tail["bias"]
    platform = "tpu" if _tpu_platform() else "cpu"

    def step(x, per_step):
        t, a_t, a_prev = per_step
        tb = common.broadcast_t(t, batch)
        h = features_fn(x, tb)
        hf = h.astype(jnp.float32)
        # plain jnp sums: XLA fuses them into the producing conv as a
        # tuple-output epilogue (measured free — the convert_reduce class)
        s1 = jnp.sum(hf, axis=(1, 2))
        s2 = jnp.sum(hf * hf, axis=(1, 2))
        mult, add = gn_affine_from_sums(
            s1, s2, h.shape[1] * h.shape[2], tail["gn_scale"],
            tail["gn_bias"], tail["groups"], tail["eps"])
        c_x = jnp.sqrt(a_prev / a_t)
        c_eps = jnp.sqrt(1.0 - a_prev) - jnp.sqrt(a_prev * (1.0 - a_t) / a_t)
        coefs = jnp.stack([jnp.asarray(guidance_scale, jnp.float32),
                           c_x, c_eps, jnp.zeros((), jnp.float32)])
        if glide_tail.sd_tail_route(h.shape, platform):
            x_prev = glide_tail.sd_cfg_tail_step(
                h, x, mult, add, w_eps, b_eps, coefs)
        else:
            x_prev = glide_tail.sd_cfg_tail_step_ref(
                h, x, mult, add, w_eps, b_eps, coefs)
        return x_prev, None

    xs = (tables["t"], tables["alpha"], tables["alpha_prev"])
    x_final, _ = jax.lax.scan(step, x_T.astype(jnp.float32), xs)
    return x_final
