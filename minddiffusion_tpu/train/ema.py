"""Exponential moving average of params (reference Taichu-GLIDE
model/glide_text2im/model/simple_nn.py:119-129 update_ema; the SD configs
carry use_ema flags, v2-inference.yaml:18)."""
from __future__ import annotations

import jax
import jax.numpy as jnp


def init_ema(params):
    return jax.tree.map(jnp.asarray, params)


def update_ema(ema_params, params, decay: float = 0.9999):
    """ema <- decay * ema + (1-decay) * params (jit-safe, pure)."""
    return jax.tree.map(
        lambda e, p: e * decay + p.astype(e.dtype) * (1.0 - decay),
        ema_params, params,
    )
