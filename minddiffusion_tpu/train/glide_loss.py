"""GLIDE training loss: eps-MSE + VLB with learned variance.

Parity targets (Taichu-GLIDE):
  * losses.py:25-86 — normal_kl, approx_standard_normal_cdf (tanh
    approximation), discretized_gaussian_log_likelihood over 1/127.5 bins.
  * model/train_model.py:74-106 — q_sample -> model -> split (eps, v);
    the VLB term uses a stop-gradient on the mean ("frozen_out") so the
    variance head learns without dragging the eps head; at t==0 the VLB is
    the discretized NLL, else KL(q(x_{t-1}|x_t,x_0) || p); total loss is
    MSE(eps) + vlb (with the per-sample importance weights `w` from the
    schedule sampler, train/resample.py:34-76).
"""
from __future__ import annotations

import math
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from minddiffusion_tpu.core.schedules import DiffusionSchedule, _extract


def normal_kl(mean1, logvar1, mean2, logvar2):
    """KL between two diagonal Gaussians (losses.py normal_kl)."""
    return 0.5 * (
        -1.0
        + logvar2
        - logvar1
        + jnp.exp(logvar1 - logvar2)
        + ((mean1 - mean2) ** 2) * jnp.exp(-logvar2)
    )


def approx_standard_normal_cdf(x):
    return 0.5 * (1.0 + jnp.tanh(math.sqrt(2.0 / math.pi) * (x + 0.044715 * x**3)))


def discretized_gaussian_log_likelihood(x, means, log_scales):
    """log p(x) for images discretized to 255 bins, x in [-1, 1]."""
    centered = x - means
    inv_stdv = jnp.exp(-log_scales)
    plus_in = inv_stdv * (centered + 1.0 / 255.0)
    min_in = inv_stdv * (centered - 1.0 / 255.0)
    cdf_plus = approx_standard_normal_cdf(plus_in)
    cdf_min = approx_standard_normal_cdf(min_in)
    log_cdf_plus = jnp.log(jnp.clip(cdf_plus, 1e-12, None))
    log_one_minus_cdf_min = jnp.log(jnp.clip(1.0 - cdf_min, 1e-12, None))
    cdf_delta = cdf_plus - cdf_min
    return jnp.where(
        x < -0.999,
        log_cdf_plus,
        jnp.where(x > 0.999, log_one_minus_cdf_min,
                  jnp.log(jnp.clip(cdf_delta, 1e-12, None))),
    )


def _mean_flat(x):
    return jnp.mean(x, axis=tuple(range(1, x.ndim)))


def vb_term(
    schedule: DiffusionSchedule,
    x_start: jnp.ndarray,
    x_t: jnp.ndarray,
    t: jnp.ndarray,
    eps: jnp.ndarray,
    v: jnp.ndarray,
) -> jnp.ndarray:
    """Per-sample VLB (bits/dim) for the learned-variance head; the mean path
    is stop-gradient'd (train_model.py frozen_out)."""
    eps_frozen = jax.lax.stop_gradient(eps)
    min_log = _extract(schedule.posterior_log_variance_clipped, t, x_t.ndim)
    max_log = _extract(jnp.log(schedule.betas), t, x_t.ndim)
    frac = (v.astype(jnp.float32) + 1.0) / 2.0
    model_log_var = frac * max_log + (1.0 - frac) * min_log

    pred_x0 = jnp.clip(
        schedule.predict_xstart_from_eps(x_t, t, eps_frozen), -1.0, 1.0)
    model_mean = schedule.q_posterior_mean(pred_x0, x_t, t)

    true_mean = schedule.q_posterior_mean(x_start, x_t, t)
    true_log_var = _extract(schedule.posterior_log_variance_clipped, t, x_t.ndim)

    kl = normal_kl(true_mean, true_log_var, model_mean, model_log_var)
    kl = _mean_flat(kl) / math.log(2.0)
    nll = -discretized_gaussian_log_likelihood(
        x_start, model_mean, 0.5 * model_log_var)
    nll = _mean_flat(nll) / math.log(2.0)
    return jnp.where(t == 0, nll, kl)


def glide_diffusion_loss(
    model_fn,                 # (x_t, t, tokens, mask) -> (eps, v)
    schedule: DiffusionSchedule,
    x_start: jnp.ndarray,     # (B,H,W,3) fp32 in [-1,1]
    tokens: jnp.ndarray,
    mask: jnp.ndarray,
    t: jnp.ndarray,           # (B,) int32, pre-sampled (possibly importance)
    weights: jnp.ndarray,     # (B,) fp32 importance weights
    rng: jax.Array,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    noise = jax.random.normal(rng, x_start.shape, jnp.float32)
    x_t = schedule.q_sample(x_start, t, noise)
    eps, v = model_fn(x_t, t, tokens, mask)
    mse = _mean_flat(jnp.square(eps.astype(jnp.float32) - noise))
    vlb = vb_term(schedule, x_start, x_t, t, eps, v)
    per_sample = mse + vlb
    loss = jnp.mean(weights * per_sample)
    return loss, {"loss": loss, "mse": jnp.mean(mse), "vlb": jnp.mean(vlb)}
