"""KL autoencoder (first stage) — flax.linen, NHWC.

Parity with the reference AutoencoderKL
(stablediffusionv2/ldm/models/autoencoder.py:65-77) and its backbone
(ldm/modules/diffusionmodules/model.py:80-440): Encoder/Decoder with
ch=128, ch_mult=(1,2,4,4), 2 ResnetBlocks per level, single-head spatial
AttnBlock at the bottleneck, swish GroupNorm(32, eps 1e-6); `quant_conv`
projects to 2*z (mean ‖ logvar), `post_quant_conv` back before decode.

encode() returns the raw moments (B, h, w, 2z); use core.distributions to
sample/mode. Latent scaling (0.18215) lives in core.latents, not here.

TPU notes: decode at 1024x768 is HBM-heavy; the pipeline can shard the batch
axis over the mesh. All convs NHWC; attention uses the shared fused op with
heads=1.
"""
from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp
from flax import linen as nn

from minddiffusion_tpu.utils.flags import flags
from flax import struct

import os

from minddiffusion_tpu.models.layers import (
    Conv3x3Params,
    GroupNorm32,
    conv1x1,
    conv3x3,
    fused_upsample_conv3x3,
    nearest_upsample_2x,
)
from minddiffusion_tpu.ops.attention import packed_attention

Dtype = Any


@struct.dataclass
class VAEConfig:
    in_channels: int = 3
    out_channels: int = 3
    ch: int = 128
    ch_mult: Tuple[int, ...] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    z_channels: int = 4
    embed_dim: int = 4
    double_z: bool = True
    dtype: Any = struct.field(pytree_node=False, default=jnp.float32)


class ResnetBlock(nn.Module):
    out_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_ch = x.shape[-1]
        h = GroupNorm32(eps=1e-6, name="norm1")(x)
        h = nn.silu(h)
        h = conv3x3(self.out_channels, self.dtype, name="conv1")(h)
        h = GroupNorm32(eps=1e-6, name="norm2")(h)
        h = nn.silu(h)
        h = conv3x3(self.out_channels, self.dtype, name="conv2")(h)
        if in_ch != self.out_channels:
            x = conv1x1(self.out_channels, self.dtype, name="nin_shortcut")(x)
        return x + h


class AttnBlock(nn.Module):
    """Single-head spatial self-attention (reference model.py:151-206)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        y = GroupNorm32(eps=1e-6, name="norm")(x)
        q = conv1x1(c, self.dtype, name="q")(y).reshape(b, h * w, c)
        k = conv1x1(c, self.dtype, name="k")(y).reshape(b, h * w, c)
        v = conv1x1(c, self.dtype, name="v")(y).reshape(b, h * w, c)
        out = packed_attention(q, k, v, heads=1)
        out = out.reshape(b, h, w, c)
        out = conv1x1(c, self.dtype, name="proj_out")(out)
        return x + out


class Encoder(nn.Module):
    config: VAEConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        h = conv3x3(cfg.ch, cfg.dtype, name="conv_in")(x.astype(cfg.dtype))
        for level, mult in enumerate(cfg.ch_mult):
            ch = cfg.ch * mult
            for i in range(cfg.num_res_blocks):
                h = ResnetBlock(ch, cfg.dtype, name=f"down_{level}_block_{i}")(h)
            if level != len(cfg.ch_mult) - 1:
                # Reference pads asymmetrically ((0,1),(0,1)) then stride-2 convs
                # (model.py Downsample); replicate to keep weights convertible.
                h = jnp.pad(h, ((0, 0), (0, 1), (0, 1), (0, 0)))
                h = nn.Conv(ch, (3, 3), strides=(2, 2), padding="VALID",
                            dtype=cfg.dtype, param_dtype=jnp.float32,
                            name=f"down_{level}_downsample")(h)
        h = ResnetBlock(ch, cfg.dtype, name="mid_block_1")(h)
        h = AttnBlock(cfg.dtype, name="mid_attn")(h)
        h = ResnetBlock(ch, cfg.dtype, name="mid_block_2")(h)
        h = GroupNorm32(eps=1e-6, name="norm_out")(h)
        h = nn.silu(h)
        out_ch = 2 * cfg.z_channels if cfg.double_z else cfg.z_channels
        return conv3x3(out_ch, cfg.dtype, name="conv_out")(h)


class Decoder(nn.Module):
    config: VAEConfig

    @nn.compact
    def __call__(self, z: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        ch = cfg.ch * cfg.ch_mult[-1]
        h = conv3x3(ch, cfg.dtype, name="conv_in")(z.astype(cfg.dtype))
        h = ResnetBlock(ch, cfg.dtype, name="mid_block_1")(h)
        h = AttnBlock(cfg.dtype, name="mid_attn")(h)
        h = ResnetBlock(ch, cfg.dtype, name="mid_block_2")(h)
        for level, mult in reversed(list(enumerate(cfg.ch_mult))):
            ch = cfg.ch * mult
            for i in range(cfg.num_res_blocks + 1):
                h = ResnetBlock(ch, cfg.dtype, name=f"up_{level}_block_{i}")(h)
            if level != 0:
                if flags().fused_up:
                    k, b = Conv3x3Params(h.shape[-1], ch,
                                         name=f"up_{level}_upsample")()
                    h = fused_upsample_conv3x3(h, k, b, cfg.dtype)
                else:
                    h = nearest_upsample_2x(h)
                    h = conv3x3(ch, cfg.dtype, name=f"up_{level}_upsample")(h)
        h = GroupNorm32(eps=1e-6, name="norm_out")(h)
        h = nn.silu(h)
        return conv3x3(cfg.out_channels, cfg.dtype, name="conv_out")(h).astype(jnp.float32)


class AutoencoderKL(nn.Module):
    """encode -> quant_conv -> moments; decode <- post_quant_conv <- z."""

    config: VAEConfig

    def setup(self):
        self.encoder = Encoder(self.config, name="encoder")
        self.decoder = Decoder(self.config, name="decoder")
        self.quant_conv = conv1x1(2 * self.config.embed_dim if self.config.double_z
                                  else self.config.embed_dim,
                                  self.config.dtype, name="quant_conv")
        self.post_quant_conv = conv1x1(self.config.z_channels, self.config.dtype,
                                       name="post_quant_conv")

    def encode(self, x: jnp.ndarray) -> jnp.ndarray:
        """Image (B,H,W,3) in [-1,1] -> moments (B,H/8,W/8,2*embed_dim) fp32."""
        return self.quant_conv(self.encoder(x)).astype(jnp.float32)

    def decode(self, z: jnp.ndarray) -> jnp.ndarray:
        """Unscaled latent (B,h,w,embed_dim) -> image (B,H,W,3) fp32 [-1,1]-ish."""
        return self.decoder(self.post_quant_conv(z.astype(self.config.dtype)))

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # autoencode with mode(moments) — used by tests only
        moments = self.encode(x)
        mean = jnp.split(moments, 2, axis=-1)[0]
        return self.decode(mean)
