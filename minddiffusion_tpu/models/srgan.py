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
import os
from typing import Any

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from minddiffusion_tpu.utils.flags import flags
from jax import lax


def pixel_shuffle_2x(x: jnp.ndarray) -> jnp.ndarray:
    """NHWC depth-to-space by 2 (DepthToSpace(2) equivalent)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h, w, 2, 2, c // 4)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h * 2, w * 2, c // 4)


def _s2d4_select(block: int = 4, taps: int = 9) -> np.ndarray:
    """One-hot selector S[kh, d, a, u] for the space-to-depth-4 kernel
    rearrangement: S=1 iff tap offset u (0..8, center 4) lands at blocked
    kernel position kh (0..2) / intra-block input phase d when producing
    intra-block output phase a, i.e. u == block*(kh-1) + d - a + taps//2.
    """
    kh = np.arange(3)[:, None, None, None]
    d = np.arange(block)[None, :, None, None]
    a = np.arange(block)[None, None, :, None]
    u = np.arange(taps)[None, None, None, :]
    return (u == block * (kh - 1) + d - a + taps // 2).astype(np.float32)


def blocked_tail_conv(x: jnp.ndarray, kernel: jnp.ndarray,
                      bias: jnp.ndarray) -> jnp.ndarray:
    """9x9 conv (C_in -> 3, SAME) computed in space-to-depth-4 blocked form.

    A direct 1024² conv with 3 output channels runs at 3/128 MXU lane
    utilization (measured 114.5 ms at 2.3 TF/s in the GLIDE cascade). The
    exact same math as a 3x3 conv over the 4x4-blocked image has C_in*16
    inputs and 48 outputs (48/128 lanes): the 9x9 kernel is scattered into a
    zero-padded (3,3,16*C_in,48) blocked kernel. 'SAME' pad of 1 block == the
    original 4-pixel pad, so results are bit-exact up to fp reassociation.
    """
    b, hh, ww, cin = x.shape
    assert hh % 4 == 0 and ww % 4 == 0, "blocked tail conv needs H,W % 4 == 0"
    s = jnp.asarray(_s2d4_select())           # (3, 4, 4, 9)
    # Wb[kh,kw,da,db,ci,a,b,oc] = sum_{u,v} S[kh,da,a,u] S[kw,db,b,v] W[u,v,ci,oc]
    wb = jnp.einsum("pdau,qebv,uvco->pqdecabo", s, s,
                    kernel.astype(jnp.float32))
    wb = wb.reshape(3, 3, 16 * cin, 16 * kernel.shape[-1])
    xb = x.reshape(b, hh // 4, 4, ww // 4, 4, cin)
    xb = xb.transpose(0, 1, 3, 2, 4, 5).reshape(b, hh // 4, ww // 4, 16 * cin)
    yb = lax.conv_general_dilated(
        xb, wb.astype(x.dtype), window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = yb.reshape(b, hh // 4, ww // 4, 4, 4, kernel.shape[-1])
    y = y.transpose(0, 1, 3, 2, 4, 5).reshape(b, hh, ww, kernel.shape[-1])
    return y + bias


class TailConv9x9(nn.Module):
    """Final 9x9 -> 3ch conv; param-tree-identical to nn.Conv(3, (9,9)).

    Routes through `blocked_tail_conv` (space-to-depth-4) unless
    MDT_GLIDE_TUNE=s2d=0 or the spatial dims aren't multiples of 4.
    """
    features: int = 3

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (9, 9, x.shape[-1], self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (self.features,), jnp.float32)
        if (flags().srgan_s2d
                and x.shape[1] % 4 == 0 and x.shape[2] % 4 == 0):
            return blocked_tail_conv(x, kernel, bias)
        y = lax.conv_general_dilated(
            x, kernel.astype(x.dtype), window_strides=(1, 1), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y + bias


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
        h = TailConv9x9(3, name="conv3")(h)
        return jnp.tanh(h)
