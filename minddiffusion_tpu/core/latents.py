"""Latent-space helpers: VAE scale factor, img2img noising, inpaint mask blend.

Reference behaviors mirrored:
  * scale_factor = 0.18215 multiplies VAE-encoded latents and divides before
    decode (stablediffusionv2/ldm/models/diffusion/ddpm.py:286-288, 312).
  * img2img: encode init image, q_sample to the start step, denoise from there.
  * inpaint latent blend: per step, x = q_sample(x0, t)*mask + x*(1-mask)
    (plms.py:156-159).
  * image <-> [-1, 1] normalization and uint8 quantization for saving.
"""
from __future__ import annotations

import jax.numpy as jnp

DEFAULT_SCALE_FACTOR = 0.18215


def scale_latents(z: jnp.ndarray, scale_factor: float = DEFAULT_SCALE_FACTOR) -> jnp.ndarray:
    return z * scale_factor


def unscale_latents(z: jnp.ndarray, scale_factor: float = DEFAULT_SCALE_FACTOR) -> jnp.ndarray:
    return z / scale_factor


def blend_masked(x: jnp.ndarray, x_known_noised: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Latent inpainting blend: keep known region from the noised original.

    mask == 1 marks the *known* (kept) region, matching plms.py:156-159.
    """
    return x_known_noised * mask + x * (1.0 - mask)


def images_to_unit_range(images_uint8: jnp.ndarray) -> jnp.ndarray:
    """uint8 [0,255] HWC -> fp32 [-1, 1]."""
    return images_uint8.astype(jnp.float32) / 127.5 - 1.0


def unit_range_to_uint8(x: jnp.ndarray) -> jnp.ndarray:
    """fp32 [-1, 1] -> uint8 [0,255], clipped (txt2img.py:266-269 equivalent)."""
    x = jnp.clip((x + 1.0) * 127.5, 0.0, 255.0)
    return jnp.round(x).astype(jnp.uint8)
