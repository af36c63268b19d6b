"""SRGAN generator for the GLIDE cascade's final x4 upscale (256 -> 1024).

Architecture parity with the reference generator
(Taichu-GLIDE/model/glide_text2im/model/srgan.py:41-117): 9x9 conv + PReLU
head, 16 residual blocks (conv-BN-PReLU-conv-BN + skip), 3x3 conv + PReLU
trunk tail with global skip, log2(scale) pixel-shuffle x2 stages, 9x9 conv +
tanh output. Inference-only (BN uses stored stats), fp32 as the reference runs
it (srgan_util.py:36-46).

TPU notes: NHWC; pixel shuffle is a reshape-transpose (depth-to-space);
BatchNorm in inference mode is a fused scale/shift.
"""
from __future__ import annotations

import math
from typing import Any

import jax.numpy as jnp
from flax import linen as nn


def pixel_shuffle_2x(x: jnp.ndarray) -> jnp.ndarray:
    """NHWC depth-to-space by 2 (DepthToSpace(2) equivalent)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h, w, 2, 2, c // 4)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h * 2, w * 2, c // 4)


class PReLU(nn.Module):
    """Channel-wise parametric ReLU (slope learned per channel)."""

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        alpha = self.param("alpha", nn.initializers.constant(0.25),
                           (x.shape[-1],), jnp.float32)
        return jnp.where(x >= 0, x, alpha * x)


class SRResBlock(nn.Module):
    channels: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        h = nn.Conv(self.channels, (3, 3), padding=1, name="conv1")(x)
        h = nn.BatchNorm(use_running_average=not train, name="bn1")(h)
        h = PReLU(name="prelu")(h)
        h = nn.Conv(self.channels, (3, 3), padding=1, name="conv2")(h)
        h = nn.BatchNorm(use_running_average=not train, name="bn2")(h)
        return h + x


class SRGANGenerator(nn.Module):
    upscale_factor: int = 4
    channels: int = 64

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """x: (B,H,W,3) fp32 in [0,1]-ish -> (B, scale*H, scale*W, 3) tanh range."""
        c = self.channels
        h0 = nn.Conv(c, (9, 9), padding=4, name="conv1")(x)
        h0 = PReLU(name="prelu1")(h0)
        h = h0
        for i in range(16):
            h = SRResBlock(c, name=f"res_{i}")(h, train)
        h = nn.Conv(c, (3, 3), padding=1, name="conv2")(h)
        h = PReLU(name="prelu2")(h)
        h = h + h0
        for i in range(int(math.log2(self.upscale_factor))):
            h = nn.Conv(4 * c, (3, 3), padding=1, name=f"up_{i}_conv")(h)
            h = pixel_shuffle_2x(h)
            h = PReLU(name=f"up_{i}_prelu")(h)
        h = nn.Conv(3, (9, 9), padding=4, name="conv3")(h)
        return jnp.tanh(h)
