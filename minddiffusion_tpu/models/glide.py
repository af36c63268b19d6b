"""Taichu-GLIDE model family (flax.linen, NHWC): xf text transformer, ADM UNet
with encoder-KV cross-attention, base + super-res Text2Im models.

Parity targets (Taichu-GLIDE/model/glide_text2im/):
  * xf.py:26-155 — pre-LN transformer, fused qkv, fp32 LayerNorms, no causal
    mask; token+positional(+padding-where-masked) embeddings
    (text2im_model.py:88-99); xf_proj = Linear(xf_out[:, -1]) added to the
    timestep embedding; xf_out is the cross-attention memory.
  * unet.py:89-310 — ResBlock with scale-shift GroupNorm and resblock up/down
    (shared with models/unet.py here); AttentionBlock whose K/V are the
    concat of projected encoder tokens and spatial tokens (unet.py:297-300),
    softmax scale 1/sqrt(ch) split as 1/ch^0.25 on q and k (:301-306).
  * text2im_model.py:101-123, 214-238 — base model (in 3 -> out 6: eps +
    learned variance); super-res variant concats bilinear-upsampled low_res
    (in 6 -> out 6).
  * Configs: default_options.py:19-148 — base 64px ch192 mult(1,2,3,4) rb3
    attn@(2,4,8) head_ch 64, xf 512x16x8 ctx 128 vocab 50001; upsample 256px
    mult(1,1,2,2,4,4) rb2 attn@(32,16,8).

TPU-first: NHWC; spatial tokens flattened by reshape (no NCL transposes);
cross+self attention fused as one attention over concat'd keys so the Pallas
kernel covers the whole op; bf16 compute, fp32 norm/softmax islands.
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from minddiffusion_tpu.utils.flags import flags
from flax import struct
import jax

from minddiffusion_tpu.models.layers import (
    GroupNorm32,
    LayerNormFp32,
    conv3x3,
    dense,
    timestep_embedding,
)
from minddiffusion_tpu.models.unet import Downsample, ResBlock, Upsample
from minddiffusion_tpu.ops.attention import packed_attention

Dtype = Any


# ---------------------------------------------------------------------------
# xf: the GLIDE text transformer
# ---------------------------------------------------------------------------

@struct.dataclass
class XfConfig:
    width: int = 512
    layers: int = 16
    heads: int = 8
    text_ctx: int = 128
    n_vocab: int = 50001
    xf_padding: bool = True
    xf_final_ln: bool = True
    # hard-error on out-of-range token ids instead of clamping (debug aid;
    # the GLIDE CLIs set this from MDT_DEBUG_TOKENS=1)
    debug_tokens: bool = False
    dtype: Any = struct.field(pytree_node=False, default=jnp.float32)


class XfBlock(nn.Module):
    heads: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, l, w = x.shape
        d = w // self.heads
        h = LayerNormFp32(name="ln_1")(x)
        qkv = dense(3 * w, self.dtype, name="qkv")(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        out = packed_attention(q, k, v, self.heads)
        x = x + dense(w, self.dtype, name="out_proj")(out)
        h = LayerNormFp32(name="ln_2")(x)
        h = dense(4 * w, self.dtype, name="mlp_fc")(h)
        h = nn.gelu(h)
        x = x + dense(w, self.dtype, name="mlp_proj")(h)
        return x


class XfTextEncoder(nn.Module):
    """tokens (B,L) + mask (B,L) -> (xf_proj (B, proj_dim), xf_out (B, L, W))."""

    config: XfConfig
    proj_dim: int  # = model_channels * 4 of the consuming UNet

    @nn.compact
    def __call__(self, tokens: jnp.ndarray, mask: jnp.ndarray):
        cfg = self.config
        tok_emb = self.param("token_embedding", nn.initializers.normal(0.02),
                             (cfg.n_vocab, cfg.width), jnp.float32)
        pos_emb = self.param("positional_embedding", nn.initializers.normal(0.01),
                             (cfg.text_ctx, cfg.width), jnp.float32)
        # mode='clip': jax fills OOB gathers with NaN by default; clamp
        # instead so stray token ids degrade gracefully. Clamping can mask
        # tokenizer bugs, so XfConfig.debug_tokens (cli: MDT_DEBUG_TOKENS=1)
        # turns OOB ids into a hard error (host assert via debug_callback).
        if cfg.debug_tokens:
            def _check(tok):
                if (tok < 0).any() or (tok >= cfg.n_vocab).any():
                    raise ValueError(
                        f"token id out of range [0, {cfg.n_vocab}): "
                        f"min={tok.min()} max={tok.max()}")
            jax.debug.callback(_check, tokens)
        x = jnp.take(tok_emb, tokens, axis=0, mode='clip').astype(cfg.dtype)
        x = x + pos_emb[None].astype(cfg.dtype)
        if cfg.xf_padding:
            pad_emb = self.param("padding_embedding", nn.initializers.normal(0.01),
                                 (cfg.text_ctx, cfg.width), jnp.float32)
            x = jnp.where(mask[..., None].astype(bool), x,
                          pad_emb[None].astype(cfg.dtype))
        for i in range(cfg.layers):
            x = XfBlock(cfg.heads, cfg.dtype, name=f"block_{i}")(x)
        if cfg.xf_final_ln:
            x = LayerNormFp32(name="final_ln")(x)
        xf_proj = dense(self.proj_dim, cfg.dtype, name="transformer_proj")(x[:, -1])
        return xf_proj, x


# ---------------------------------------------------------------------------
# ADM UNet with encoder-KV attention
# ---------------------------------------------------------------------------

class GlideAttentionBlock(nn.Module):
    """Self-attention over spatial tokens with encoder tokens folded into K/V.

    The reference projects encoder_out through `encoder_kv` (unet.py:249) and
    prepends it to the self-attention keys/values (:297-300). One fused
    attention over Nk = L_text + H*W tokens.
    """

    heads: int
    dtype: Dtype = jnp.float32
    attn_impl: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, encoder_out: Optional[jnp.ndarray] = None):
        b, h, w, c = x.shape
        d = c // self.heads
        n = h * w
        y = GroupNorm32(name="norm")(x).reshape(b, n, c)
        qkv = dense(3 * c, self.dtype, name="qkv")(y)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        if encoder_out is not None:
            hoistable = not self.is_initializing()
            if hoistable and self.has_variable("xattn_kv", "ek"):
                # hoisted encoder K/V: the xf encoding is constant across
                # every sampler step, so the pipeline captures this projection
                # once OUTSIDE the scan (glide_cascade capture pass)
                ek = self.get_variable("xattn_kv", "ek")
                ev = self.get_variable("xattn_kv", "ev")
            else:
                ekv = dense(2 * c, self.dtype, name="encoder_kv")(
                    encoder_out.astype(self.dtype))
                ek, ev = jnp.split(ekv, 2, axis=-1)
                if hoistable and self.is_mutable_collection("xattn_kv"):
                    self.put_variable("xattn_kv", "ek", ek)
                    self.put_variable("xattn_kv", "ev", ev)
            k = jnp.concatenate([ek, k], axis=1)
            v = jnp.concatenate([ev, v], axis=1)
        # whole-nq q tiles at GLIDE's short-nk spatial sites (r3h A/B: 2.005
        # vs 1.999 img/s cascade; promoted r4 for pin margin). The dispatch
        # validates divisibility/budget and falls back where it doesn't fit.
        # MDT_GLIDE_TUNE=attn_route=<n> additionally routes the mid-length
        # 16² tiers (nq=256, nk=384) to the kernel (r5 A/B surface).
        out = packed_attention(q, k, v, self.heads, impl=self.attn_impl,
                               block_q=1024,
                               min_q=flags().glide_attn_route)
        out = dense(c, self.dtype, zero_init=True, name="proj_out")(out)
        return x + out.reshape(b, h, w, c)


@struct.dataclass
class GlideUNetConfig:
    in_channels: int = 3
    model_channels: int = 192
    out_channels: int = 6          # eps + learned variance
    num_res_blocks: int = 3
    attention_resolutions: Tuple[int, ...] = (2, 4, 8)
    channel_mult: Tuple[int, ...] = (1, 2, 3, 4)
    num_head_channels: int = 64
    use_scale_shift_norm: bool = True
    resblock_updown: bool = True
    dtype: Any = struct.field(pytree_node=False, default=jnp.float32)
    attn_impl: Optional[str] = None

    @classmethod
    def base_64(cls, **kw) -> "GlideUNetConfig":
        return cls(**kw)

    @classmethod
    def upsample_256(cls, **kw) -> "GlideUNetConfig":
        kw.setdefault("in_channels", 6)
        kw.setdefault("num_res_blocks", 2)
        kw.setdefault("channel_mult", (1, 1, 2, 2, 4, 4))
        kw.setdefault("attention_resolutions", (8, 16, 32))
        return cls(**kw)


class GlideUNet(nn.Module):
    """ADM UNet; emb already includes xf_proj; encoder_out is cross-attn memory."""

    config: GlideUNetConfig

    def _attn(self, ch: int, name: str) -> GlideAttentionBlock:
        cfg = self.config
        return GlideAttentionBlock(
            heads=ch // cfg.num_head_channels, dtype=cfg.dtype,
            attn_impl=cfg.attn_impl, name=name,
        )

    @nn.compact
    def __call__(self, x, emb, encoder_out=None):
        cfg = self.config
        h = x.astype(cfg.dtype)

        hs = []
        ch = cfg.model_channels * cfg.channel_mult[0]
        h = conv3x3(ch, cfg.dtype, name="in_conv")(h)
        hs.append(h)
        ds = 1
        for level, mult in enumerate(cfg.channel_mult):
            for i in range(cfg.num_res_blocks):
                ch = mult * cfg.model_channels
                h = ResBlock(out_channels=ch, dtype=cfg.dtype,
                             use_scale_shift_norm=cfg.use_scale_shift_norm,
                             name=f"down_{level}_{i}_res")(h, emb)
                if ds in cfg.attention_resolutions:
                    h = self._attn(ch, f"down_{level}_{i}_attn")(h, encoder_out)
                hs.append(h)
            if level != len(cfg.channel_mult) - 1:
                if cfg.resblock_updown:
                    h = ResBlock(out_channels=ch, dtype=cfg.dtype,
                                 use_scale_shift_norm=cfg.use_scale_shift_norm,
                                 down=True, name=f"down_{level}_ds")(h, emb)
                else:
                    h = Downsample(ch, cfg.dtype, name=f"down_{level}_ds")(h)
                hs.append(h)
                ds *= 2

        h = ResBlock(out_channels=ch, dtype=cfg.dtype,
                     use_scale_shift_norm=cfg.use_scale_shift_norm,
                     name="mid_res1")(h, emb)
        h = self._attn(ch, "mid_attn")(h, encoder_out)
        h = ResBlock(out_channels=ch, dtype=cfg.dtype,
                     use_scale_shift_norm=cfg.use_scale_shift_norm,
                     name="mid_res2")(h, emb)

        for level, mult in reversed(list(enumerate(cfg.channel_mult))):
            for i in range(cfg.num_res_blocks + 1):
                skip = hs.pop()
                ch = mult * cfg.model_channels
                # Skip-join strategy (MDT_GLIDE_TUNE=skip_join=…, all param-tree
                # identical). GLIDE's 192-ch halves pad 192->256 on the MXU
                # K dim, so SD2's split-concat path REGRESSED here (SR stage
                # 2229->2390 ms measured r3f) — the 384-wide concat is the
                # lane-aligned form. But XLA fuses a plain concat INTO the
                # consuming conv and re-reads operands per K-panel (skip
                # 1x1s at 66 TF/s / 518 GB/s): 'barrier' materializes the
                # concat once to keep the conv at its lane cap.
                join = flags().glide_skip_join
                if join == "split":
                    h = ResBlock(out_channels=ch, dtype=cfg.dtype,
                                 use_scale_shift_norm=cfg.use_scale_shift_norm,
                                 name=f"up_{level}_{i}_res")(h, emb, skip=skip)
                else:
                    h = jnp.concatenate([h, skip], axis=-1)
                    if join == "barrier":
                        h = jax.lax.optimization_barrier(h)
                    h = ResBlock(out_channels=ch, dtype=cfg.dtype,
                                 use_scale_shift_norm=cfg.use_scale_shift_norm,
                                 name=f"up_{level}_{i}_res")(h, emb)
                if ds in cfg.attention_resolutions:
                    h = self._attn(ch, f"up_{level}_{i}_attn")(h, encoder_out)
                if level and i == cfg.num_res_blocks:
                    if cfg.resblock_updown:
                        h = ResBlock(out_channels=ch, dtype=cfg.dtype,
                                     use_scale_shift_norm=cfg.use_scale_shift_norm,
                                     up=True, name=f"up_{level}_us")(h, emb)
                    else:
                        h = Upsample(ch, cfg.dtype, name=f"up_{level}_us")(h)
                    ds //= 2

        h = GroupNorm32(name="out_norm")(h)
        h = nn.silu(h)
        h = conv3x3(cfg.out_channels, cfg.dtype, zero_init=True, name="out_conv")(h)
        return h.astype(jnp.float32)


# ---------------------------------------------------------------------------
# Text2Im wrappers
# ---------------------------------------------------------------------------

class Text2ImUNet(nn.Module):
    """GLIDE base model: (x, t, tokens, mask) -> (eps, v), each (B,H,W,3).

    `encode_text` and `denoise` are exposed separately so pipelines can run
    the 16-layer xf ONCE per generation instead of once per denoise step (the
    reference re-runs it inside every UNet call, text2im_model.py:101-106 —
    ~60x redundant transformer work per image; hoisting it out is pure win
    since xf output depends only on the tokens)."""

    unet_config: GlideUNetConfig
    xf_config: XfConfig

    def setup(self):
        cfg = self.unet_config
        self.xf = XfTextEncoder(self.xf_config, cfg.model_channels * 4, name="xf")
        self.unet = GlideUNet(cfg, name="unet")
        self.time_embed_0 = dense(cfg.model_channels * 4, cfg.dtype, name="time_embed_0")
        self.time_embed_2 = dense(cfg.model_channels * 4, cfg.dtype, name="time_embed_2")

    def encode_text(self, tokens, mask):
        return self.xf(tokens, mask)

    def _time_emb(self, timesteps):
        cfg = self.unet_config
        t_emb = timestep_embedding(timesteps, cfg.model_channels)
        emb = self.time_embed_0(t_emb.astype(cfg.dtype))
        return self.time_embed_2(nn.silu(emb))

    def denoise(self, x, timesteps, xf_proj, xf_out):
        emb = self._time_emb(timesteps) + xf_proj.astype(self.unet_config.dtype)
        out = self.unet(x, emb, xf_out)
        eps, v = jnp.split(out, 2, axis=-1)
        return eps, v

    def __call__(self, x, timesteps, tokens, mask):
        xf_proj, xf_out = self.encode_text(tokens, mask)
        return self.denoise(x, timesteps, xf_proj, xf_out)


class SuperResText2ImUNet(nn.Module):
    """GLIDE super-res: concat bilinear-upsampled low_res (text2im_model.py:214)."""

    unet_config: GlideUNetConfig
    xf_config: XfConfig

    def setup(self):
        cfg = self.unet_config
        self.xf = XfTextEncoder(self.xf_config, cfg.model_channels * 4, name="xf")
        self.unet = GlideUNet(cfg, name="unet")
        self.time_embed_0 = dense(cfg.model_channels * 4, cfg.dtype, name="time_embed_0")
        self.time_embed_2 = dense(cfg.model_channels * 4, cfg.dtype, name="time_embed_2")

    def encode_text(self, tokens, mask):
        return self.xf(tokens, mask)

    def denoise(self, x, timesteps, low_res, xf_proj, xf_out):
        cfg = self.unet_config
        b, h, w, _ = x.shape
        up = jax.image.resize(low_res.astype(jnp.float32), (b, h, w, low_res.shape[-1]),
                              method="bilinear")
        x = jnp.concatenate([x.astype(jnp.float32), up], axis=-1)
        t_emb = timestep_embedding(timesteps, cfg.model_channels)
        emb = self.time_embed_0(t_emb.astype(cfg.dtype))
        emb = self.time_embed_2(nn.silu(emb)) + xf_proj.astype(cfg.dtype)
        out = self.unet(x, emb, xf_out)
        eps, v = jnp.split(out, 2, axis=-1)
        return eps, v

    def __call__(self, x, timesteps, low_res, tokens, mask):
        xf_proj, xf_out = self.encode_text(tokens, mask)
        return self.denoise(x, timesteps, low_res, xf_proj, xf_out)
