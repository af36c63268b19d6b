"""CLIP-style causal text transformers (flax.linen).

Parity targets:
  * SD2 (en): width 1024, 23 layers, 16 heads, vocab 49408, ctx 77, plain GELU
    (stablediffusionv2/ldm/modules/encoders/modules.py:29 and
    text_encoder.py:25-153 — its "QuickGELU" subclasses plain GELU).
  * wukong (zh): width 768, 12 layers, 12 heads, vocab 49408 (wordpiece), ctx
    77, sigmoid QuickGELU x*sigmoid(1.702x)
    (wukong-huahua/ldm/modules/encoders/text_encoder.py:67-75, modules.py:30).
Both return the full (B, 77, width) final-LayerNorm sequence (no pooling) —
that sequence is the cross-attention context.

TPU-first: batch-major (B, L, W) throughout (the reference shuttles (L, B, W)
for its MultiheadAttention, text_encoder.py:143-153); fused qkv Dense; causal
mask as an additive fp32 bias on the shared attention op. 77-token sequences
are tiny — this whole encoder is one XLA fusion chain, no Pallas needed.
"""
from __future__ import annotations

from typing import Any, Callable

import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from flax import struct

from minddiffusion_tpu.models.layers import LayerNormFp32, dense
from minddiffusion_tpu.ops.attention import einsum_attention

Dtype = Any


def quick_gelu(x: jnp.ndarray) -> jnp.ndarray:
    return x * nn.sigmoid(1.702 * x)


def exact_gelu(x: jnp.ndarray) -> jnp.ndarray:
    """erf GELU (torch nn.GELU default) — OpenCLIP towers use this; the
    reference's SD2 "QuickGELU" is actually MindSpore nn.GELU, i.e. the TANH
    approximation (text_encoder.py:67-69), which flax nn.gelu matches."""
    return nn.gelu(x, approximate=False)


@struct.dataclass
class CLIPTextConfig:
    vocab_size: int = 49408
    width: int = 1024
    layers: int = 23
    heads: int = 16
    context_length: int = 77
    use_quick_gelu: bool = False
    # exact erf GELU for OpenCLIP-weight parity (eval towers); generation
    # towers keep the tanh approximation for reference-checkpoint parity
    use_exact_gelu: bool = False
    dtype: Any = struct.field(pytree_node=False, default=jnp.float32)

    @classmethod
    def sd2_en(cls, **kw) -> "CLIPTextConfig":
        return cls(width=1024, layers=23, heads=16, use_quick_gelu=False, **kw)

    @classmethod
    def wukong_zh(cls, **kw) -> "CLIPTextConfig":
        return cls(width=768, layers=12, heads=12, use_quick_gelu=True, **kw)


class CausalSelfAttention(nn.Module):
    heads: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, bias: jnp.ndarray) -> jnp.ndarray:
        b, l, w = x.shape
        head_dim = w // self.heads
        qkv = dense(3 * w, self.dtype, name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, l, self.heads, head_dim)
        k = k.reshape(b, l, self.heads, head_dim)
        v = v.reshape(b, l, self.heads, head_dim)
        out = einsum_attention(q, k, v, bias=bias)
        return dense(w, self.dtype, name="out_proj")(out.reshape(b, l, w))


class ResidualAttentionBlock(nn.Module):
    heads: int
    act: Callable = nn.gelu
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, bias: jnp.ndarray) -> jnp.ndarray:
        w = x.shape[-1]
        x = x + CausalSelfAttention(self.heads, self.dtype, name="attn")(
            LayerNormFp32(name="ln_1")(x), bias
        )
        h = LayerNormFp32(name="ln_2")(x)
        h = dense(4 * w, self.dtype, name="mlp_fc")(h)
        h = self.act(h)
        h = dense(w, self.dtype, name="mlp_proj")(h)
        return x + h


class CLIPTextEncoder(nn.Module):
    """token ids (B, L) int32 -> (B, L, width) fp32 final-LN sequence."""

    config: CLIPTextConfig

    @nn.compact
    def __call__(self, tokens: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        tok_emb = self.param(
            "token_embedding", nn.initializers.normal(0.02),
            (cfg.vocab_size, cfg.width), jnp.float32,
        )
        pos_emb = self.param(
            "positional_embedding", nn.initializers.normal(0.01),
            (cfg.context_length, cfg.width), jnp.float32,
        )
        x = jnp.take(tok_emb, tokens, axis=0, mode='clip').astype(cfg.dtype)
        x = x + pos_emb[None, : x.shape[1]].astype(cfg.dtype)

        l = x.shape[1]
        causal = np.triu(np.full((l, l), -np.inf, dtype=np.float32), 1)
        bias = jnp.asarray(causal)[None, None]  # (1, 1, L, L), additive fp32

        act = (quick_gelu if cfg.use_quick_gelu
               else exact_gelu if cfg.use_exact_gelu else nn.gelu)
        for i in range(cfg.layers):
            x = ResidualAttentionBlock(cfg.heads, act, cfg.dtype, name=f"resblock_{i}")(
                x, bias
            )
        return LayerNormFp32(name="ln_final")(x).astype(jnp.float32)
