"""SD UNet denoiser (flax.linen, NHWC, bf16 compute).

Architecture parity with the reference UNetModel
(stablediffusionv2/ldm/modules/diffusionmodules/openaimodel.py:245-576):
sinusoidal t-embedding -> 2-layer MLP; input conv; per level
`num_res_blocks` ResBlocks (+ SpatialTransformer at attention ds rates);
conv Downsample between levels; middle Res-Attn-Res; mirrored up path with
skip-concat and nearest-2x Upsample+conv; GroupNorm-SiLU-zeroconv head.

TPU inversions vs the reference:
  * NHWC + channels-last skip concat (axis=-1).
  * `remat` flag wires `jax.checkpoint` (flax nn.remat) around each level's
    blocks — the reference plumbs use_checkpoint but MindSpore ignores it
    (openaimodel.py:117,263); here it actually gates rematerialization.
  * attention uses the fused Pallas kernel at spatial lengths (ops/attention).

Configs (v2-inference.yaml:24-38, v1-inference-chinese.yaml:24-37):
SD2: ch 320, mult (1,2,4,4), attn ds (4,2,1), head_dim 64, ctx 1024, linear-in-
transformer. SD1/wukong: heads 8, ctx 768, conv projections.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn
from flax import struct

from minddiffusion_tpu.models.attention import SpatialTransformer
from minddiffusion_tpu.models.layers import (
    GroupNorm32,
    avg_pool_2x,
    conv1x1,
    conv3x3,
    dense,
    nearest_upsample_2x,
    timestep_embedding,
)

Dtype = Any


@struct.dataclass
class UNetConfig:
    in_channels: int = 4
    model_channels: int = 320
    out_channels: int = 4
    num_res_blocks: int = 2
    attention_resolutions: Tuple[int, ...] = (4, 2, 1)
    channel_mult: Tuple[int, ...] = (1, 2, 4, 4)
    num_heads: int = -1
    num_head_channels: int = -1
    transformer_depth: int = 1
    context_dim: Optional[int] = 1024
    use_linear_in_transformer: bool = False
    use_scale_shift_norm: bool = False
    resblock_updown: bool = False
    # adm (class-label) conditioning: label embedding added to the t-embedding
    # (reference ddpm.py:360-379 'adm' DiffusionWrapper branch +
    # openaimodel.py num_classes/label_emb path)
    num_classes: Optional[int] = None
    dtype: Any = struct.field(pytree_node=False, default=jnp.float32)
    remat: bool = False
    enable_lora: bool = False
    lora_rank: int = 4
    lora_alpha: float = 4.0
    attn_impl: Optional[str] = None

    def head_split(self, ch: int) -> Tuple[int, int]:
        """(num_heads, dim_head) at a given channel width (openaimodel.py:374-383)."""
        if self.num_head_channels == -1:
            return self.num_heads, ch // self.num_heads
        return ch // self.num_head_channels, self.num_head_channels

    @classmethod
    def sd2(cls, **kw) -> "UNetConfig":
        return cls(num_head_channels=64, context_dim=1024,
                   use_linear_in_transformer=True, **kw)

    @classmethod
    def sd1(cls, **kw) -> "UNetConfig":
        return cls(num_heads=8, context_dim=768, **kw)

    @classmethod
    def sd1_inpaint(cls, **kw) -> "UNetConfig":
        # 9-ch input: 4 latent + 4 masked-image latent + 1 mask
        # (wukong-huahua_inpaint_inference.yaml "in_channels: 9").
        return cls(in_channels=9, num_heads=8, context_dim=768, **kw)


class ResBlock(nn.Module):
    """GN-SiLU-conv / +t-emb / GN-SiLU-zeroconv with learned skip if needed."""

    out_channels: int
    dtype: Dtype = jnp.float32
    use_scale_shift_norm: bool = False
    up: bool = False
    down: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, emb: jnp.ndarray) -> jnp.ndarray:
        in_ch = x.shape[-1]
        h = GroupNorm32(name="norm_in")(x)
        h = nn.silu(h)
        if self.up:
            h = nearest_upsample_2x(h)
            x = nearest_upsample_2x(x)
        elif self.down:
            h = avg_pool_2x(h)
            x = avg_pool_2x(x)
        h = conv3x3(self.out_channels, self.dtype, name="conv_in")(h)

        emb_out = dense(
            2 * self.out_channels if self.use_scale_shift_norm else self.out_channels,
            self.dtype, name="emb_proj",
        )(nn.silu(emb))
        emb_out = emb_out[:, None, None, :]

        if self.use_scale_shift_norm:
            scale, shift = jnp.split(emb_out, 2, axis=-1)
            h = GroupNorm32(name="norm_out")(h) * (1.0 + scale) + shift
            h = nn.silu(h)
        else:
            h = h + emb_out
            h = GroupNorm32(name="norm_out")(h)
            h = nn.silu(h)
        h = conv3x3(self.out_channels, self.dtype, zero_init=True, name="conv_out")(h)

        if in_ch != self.out_channels:
            x = conv1x1(self.out_channels, self.dtype, name="skip")(x)
        return x + h


class Downsample(nn.Module):
    out_channels: int
    dtype: Dtype = jnp.float32
    use_conv: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.use_conv:
            return conv3x3(self.out_channels, self.dtype, stride=2, name="conv")(x)
        return avg_pool_2x(x)


class Upsample(nn.Module):
    out_channels: int
    dtype: Dtype = jnp.float32
    use_conv: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nearest_upsample_2x(x)
        if self.use_conv:
            x = conv3x3(self.out_channels, self.dtype, name="conv")(x)
        return x


class UNetModel(nn.Module):
    """The SD denoiser. x: (B, H, W, C) latents; t: (B,); context: (B, L, ctx)."""

    config: UNetConfig

    def _spatial_transformer(self, ch: int, name: str) -> SpatialTransformer:
        cfg = self.config
        heads, dim_head = cfg.head_split(ch)
        return SpatialTransformer(
            in_channels=ch, heads=heads, dim_head=dim_head,
            depth=cfg.transformer_depth, context_dim=cfg.context_dim,
            use_linear=cfg.use_linear_in_transformer, dtype=cfg.dtype,
            enable_lora=cfg.enable_lora, lora_rank=cfg.lora_rank,
            lora_alpha=cfg.lora_alpha, attn_impl=cfg.attn_impl, name=name,
        )

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        timesteps: jnp.ndarray,
        context: Optional[jnp.ndarray] = None,
        y: Optional[jnp.ndarray] = None,
        cfg_fold: bool = False,
    ) -> jnp.ndarray:
        """cfg_fold=True: classifier-free-guidance dedup. `x`/`timesteps` come
        in at batch B while `context` is the [uncond; cond] fold at 2B; the
        network runs ONCE at B until the first cross-attention (where the two
        guidance halves first differ), then duplicates activations to 2B.
        Output batch is 2B, numerically identical to applying the model to
        [x; x] — the prefix (in_conv, first resblock, first LN/proj/self-attn)
        is simply not computed twice. Requires a context and at least one
        spatial transformer; class labels (y) are per-half, so adm models
        cannot fold."""
        cfg = self.config
        time_embed_dim = cfg.model_channels * 4
        if cfg_fold:
            if context is None:
                raise ValueError("cfg_fold requires cross-attention context")
            if y is not None:
                raise ValueError("cfg_fold is incompatible with class labels")

        t_emb = timestep_embedding(timesteps, cfg.model_channels)
        emb = dense(time_embed_dim, cfg.dtype, name="time_embed_0")(t_emb.astype(cfg.dtype))
        emb = dense(time_embed_dim, cfg.dtype, name="time_embed_2")(nn.silu(emb))
        if cfg.num_classes is not None:
            # 'adm' class conditioning (openaimodel.py label_emb): y (B,) int
            if y is None:
                raise ValueError("num_classes set but no class labels given")
            emb = emb + nn.Embed(
                cfg.num_classes, time_embed_dim, dtype=cfg.dtype,
                param_dtype=jnp.float32, name="label_emb")(y)

        h = x.astype(cfg.dtype)
        if context is not None:
            context = context.astype(cfg.dtype)

        res_block = nn.remat(ResBlock) if cfg.remat else ResBlock

        pending_fold = cfg_fold

        def transformer(h, ch, name):
            nonlocal pending_fold, emb
            h = self._spatial_transformer(ch, name)(h, context,
                                                    cfg_fold=pending_fold)
            if pending_fold:
                emb = jnp.concatenate([emb, emb], axis=0)
                pending_fold = False
            return h

        hs = []
        h = conv3x3(cfg.model_channels, cfg.dtype, name="in_conv")(h)
        hs.append(h)
        ch = cfg.model_channels
        ds = 1
        # --- down path ---
        for level, mult in enumerate(cfg.channel_mult):
            for i in range(cfg.num_res_blocks):
                ch = mult * cfg.model_channels
                h = res_block(out_channels=ch, dtype=cfg.dtype,
                              use_scale_shift_norm=cfg.use_scale_shift_norm,
                              name=f"down_{level}_{i}_res")(h, emb)
                if ds in cfg.attention_resolutions:
                    h = transformer(h, ch, f"down_{level}_{i}_attn")
                hs.append(h)
            if level != len(cfg.channel_mult) - 1:
                if cfg.resblock_updown:
                    h = res_block(out_channels=ch, dtype=cfg.dtype,
                                  use_scale_shift_norm=cfg.use_scale_shift_norm,
                                  down=True, name=f"down_{level}_ds")(h, emb)
                else:
                    h = Downsample(ch, cfg.dtype, name=f"down_{level}_ds")(h)
                hs.append(h)
                ds *= 2

        # --- middle ---
        h = res_block(out_channels=ch, dtype=cfg.dtype,
                      use_scale_shift_norm=cfg.use_scale_shift_norm,
                      name="mid_res1")(h, emb)
        h = transformer(h, ch, "mid_attn")
        h = res_block(out_channels=ch, dtype=cfg.dtype,
                      use_scale_shift_norm=cfg.use_scale_shift_norm,
                      name="mid_res2")(h, emb)
        if pending_fold:
            raise ValueError("cfg_fold requires at least one spatial transformer")

        # --- up path ---
        for level, mult in reversed(list(enumerate(cfg.channel_mult))):
            for i in range(cfg.num_res_blocks + 1):
                skip = hs.pop()
                if skip.shape[0] != h.shape[0]:
                    # pre-fold skip (batch B) meeting a folded h (2B)
                    skip = jnp.concatenate([skip, skip], axis=0)
                h = jnp.concatenate([h, skip], axis=-1)
                ch = mult * cfg.model_channels
                h = res_block(out_channels=ch, dtype=cfg.dtype,
                              use_scale_shift_norm=cfg.use_scale_shift_norm,
                              name=f"up_{level}_{i}_res")(h, emb)
                if ds in cfg.attention_resolutions:
                    h = transformer(h, ch, f"up_{level}_{i}_attn")
                if level and i == cfg.num_res_blocks:
                    if cfg.resblock_updown:
                        h = res_block(out_channels=ch, dtype=cfg.dtype,
                                      use_scale_shift_norm=cfg.use_scale_shift_norm,
                                      up=True, name=f"up_{level}_us")(h, emb)
                    else:
                        h = Upsample(ch, cfg.dtype, name=f"up_{level}_us")(h)
                    ds //= 2

        h = GroupNorm32(name="out_norm")(h)
        h = nn.silu(h)
        h = conv3x3(cfg.out_channels, cfg.dtype, zero_init=True, name="out_conv")(h)
        return h.astype(jnp.float32)
