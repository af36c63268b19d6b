"""GLIDE-style samplers: ancestral p-sample and DDIM, with learned variance.

Reference behavior (Taichu-GLIDE/model/glide_text2im/model/gaussian_diffusion.py):
  * the UNet emits 2*C channels: (eps, v); the variance is an interpolation
    exp(frac*log(beta_t) + (1-frac)*log(posterior_var_t)) with frac=(v+1)/2
    (:229-254),
  * pred_x0 is clipped to [-1, 1] before the posterior mean,
  * ancestral noise is masked out at t == 0 (:79-91),
  * DDIM (eta=0) re-derives eps from the clipped pred_x0 (:113-142),
  * schedules are respaced; the model is fed original timesteps through
    `timestep_map` (:288-305).

Here both loops are single `lax.scan` programs over a respaced
`DiffusionSchedule` (core/schedules.respace_schedule). The model function has
signature `model_fn(x, t_original) -> (eps, v)` with batch-B tensors; CFG
wrapping happens outside (core/cfg.py + pipelines/glide_cascade.py).
"""
from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from minddiffusion_tpu.core.schedules import DiffusionSchedule, _extract
from minddiffusion_tpu.samplers import common

GlideModelFn = Callable[[jnp.ndarray, jnp.ndarray], Tuple[jnp.ndarray, jnp.ndarray]]


def p_mean_variance(
    model_fn: GlideModelFn,
    schedule: DiffusionSchedule,
    x: jnp.ndarray,
    t: jnp.ndarray,
    clip_denoised: bool = True,
    model_key: Optional[jax.Array] = None,
):
    """Returns (mean, log_variance, pred_x0) for the spaced timestep t (B,).

    When `model_key` is given, the model is called as model_fn(x, t, key) —
    used by the GLIDE exact-parity CFG mode, whose uncond branch re-draws
    random tokens every step (guider.py:36-50, main_funcs.py:37-38)."""
    t_orig = jnp.take(schedule.timestep_map, t)
    if model_key is not None:
        eps, v = model_fn(x, t_orig, model_key)
    else:
        eps, v = model_fn(x, t_orig)
    eps = eps.astype(jnp.float32)
    v = v.astype(jnp.float32)

    min_log = _extract(schedule.posterior_log_variance_clipped, t, x.ndim)
    max_log = _extract(jnp.log(schedule.betas), t, x.ndim)
    frac = (v + 1.0) / 2.0
    log_var = frac * max_log + (1.0 - frac) * min_log

    pred_x0 = schedule.predict_xstart_from_eps(x, t, eps)
    if clip_denoised:
        pred_x0 = jnp.clip(pred_x0, -1.0, 1.0)
    mean = schedule.q_posterior_mean(pred_x0, x, t)
    return mean, log_var, pred_x0


def p_sample_loop(
    model_fn: GlideModelFn,
    x_T: jnp.ndarray,
    schedule: DiffusionSchedule,
    key: jax.Array,
    clip_denoised: bool = True,
    model_takes_key: bool = False,
    row_keys: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Ancestral sampling over all spaced steps, T-1 .. 0, one XLA program.

    `model_takes_key=True` feeds a fresh per-step key to the model as a third
    argument (GLIDE per-step random-token uncond, the exact-parity CFG mode).

    `row_keys` (B, 2) uint32: when given, step i's ancestral noise for row b
    is drawn from fold_in(row_keys[b], i) instead of a batch-level key — a
    row's trajectory then depends only on its own key, not on batch
    composition (per-request determinism for serving/engine)."""
    n = schedule.num_timesteps
    ts = jnp.arange(n - 1, -1, -1, dtype=jnp.int32)
    keys = common.per_step_keys(key, n)
    steps = jnp.arange(n, dtype=jnp.int32)
    batch = x_T.shape[0]

    def step(x, per_step):
        t, k, i = per_step
        if model_takes_key:
            k, k_model = jax.random.split(k)
        tb = common.broadcast_t(t, batch)
        mean, log_var, _ = p_mean_variance(
            model_fn, schedule, x, tb, clip_denoised,
            model_key=k_model if model_takes_key else None)
        if row_keys is None:
            noise = jax.random.normal(k, x.shape, dtype=jnp.float32)
        else:
            noise = jax.vmap(lambda rk: jax.random.normal(
                jax.random.fold_in(rk, i), x.shape[1:], jnp.float32))(row_keys)
        nonzero = (t > 0).astype(jnp.float32)
        x_prev = mean + nonzero * jnp.exp(0.5 * log_var) * noise
        return x_prev, None

    x_final, _ = jax.lax.scan(step, x_T.astype(jnp.float32), (ts, keys, steps))
    return x_final


def ddim_sample_loop(
    model_fn: GlideModelFn,
    x_T: jnp.ndarray,
    schedule: DiffusionSchedule,
    eta: float = 0.0,
    key: Optional[jax.Array] = None,
    clip_denoised: bool = True,
) -> jnp.ndarray:
    """DDIM over the spaced schedule (super-res stage uses this with eta=0)."""
    n = schedule.num_timesteps
    ts = jnp.arange(n - 1, -1, -1, dtype=jnp.int32)
    keys = common.per_step_keys(key, n)
    batch = x_T.shape[0]

    def step(x, per_step):
        t, k = per_step
        tb = common.broadcast_t(t, batch)
        _, _, pred_x0 = p_mean_variance(model_fn, schedule, x, tb, clip_denoised)
        # Re-derive eps from the clipped x0 (gaussian_diffusion.py ddim path).
        sr = _extract(schedule.sqrt_recip_alphas_cumprod, tb, x.ndim)
        srm1 = _extract(schedule.sqrt_recipm1_alphas_cumprod, tb, x.ndim)
        eps = (sr * x - pred_x0) / srm1
        abar_prev = _extract(schedule.alphas_cumprod_prev, tb, x.ndim)
        abar = _extract(schedule.alphas_cumprod, tb, x.ndim)
        sigma = eta * jnp.sqrt((1 - abar_prev) / (1 - abar)) * jnp.sqrt(1 - abar / abar_prev)
        noise = jax.random.normal(k, x.shape, dtype=jnp.float32)
        nonzero = (t > 0).astype(jnp.float32)
        x_prev = (
            pred_x0 * jnp.sqrt(abar_prev)
            + jnp.sqrt(jnp.maximum(1.0 - abar_prev - sigma**2, 0.0)) * eps
            + nonzero * sigma * noise
        )
        return x_prev, None

    x_final, _ = jax.lax.scan(step, x_T.astype(jnp.float32), (ts, keys))
    return x_final
