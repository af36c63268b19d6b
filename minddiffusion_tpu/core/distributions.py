"""Diagonal Gaussian posterior used by the KL-VAE.

Reference: stablediffusionv2/ldm/modules/distributions/distributions.py:18-29.
Functional (no class state): the VAE encoder emits concat(mean, logvar) on the
channel axis; `sample` reparameterizes with an explicit PRNG key.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def split_moments(moments: jnp.ndarray):
    """Split encoder output (…, 2C) channel-last into (mean, logvar), logvar clamped."""
    mean, logvar = jnp.split(moments, 2, axis=-1)
    logvar = jnp.clip(logvar, -30.0, 20.0)
    return mean, logvar


def sample(key: jax.Array, moments: jnp.ndarray) -> jnp.ndarray:
    mean, logvar = split_moments(moments)
    std = jnp.exp(0.5 * logvar)
    return mean + std * jax.random.normal(key, mean.shape, dtype=mean.dtype)


def mode(moments: jnp.ndarray) -> jnp.ndarray:
    mean, _ = split_moments(moments)
    return mean


def kl(moments: jnp.ndarray) -> jnp.ndarray:
    """KL(q || N(0, I)) per batch element, summed over non-batch dims."""
    mean, logvar = split_moments(moments)
    var = jnp.exp(logvar)
    reduce_axes = tuple(range(1, mean.ndim))
    return 0.5 * jnp.sum(mean**2 + var - 1.0 - logvar, axis=reduce_axes)
