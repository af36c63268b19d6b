"""SD spatial transformer stack (flax.linen, NHWC tokens, fused-attention op).

Behavioral parity with the reference
(stablediffusionv2/ldm/modules/attention.py:41-256 and the wukong LoRA variant
wukong-huahua/ldm/modules/attention.py:97-127):
  * BasicTransformerBlock = self-attn -> cross-attn(context) -> GEGLU FF, each
    pre-LayerNorm with residual.
  * SpatialTransformer: GroupNorm32 -> proj_in -> blocks over (H*W) tokens ->
    zero-init proj_out -> residual. `use_linear` chooses Dense vs 1x1-conv
    projections and their ordering relative to the flatten (v2 uses linear).
  * CrossAttention: per-head scale d_head^-0.5, no q/k/v bias, output Dense
    with bias. Optional LoRA adapters (rank/alpha, q/k/v/out) replace the
    MindPet LoRADense injection.

TPU inversions: tokens stay (B, N, H, D) for the fused attention op; NHWC
means flatten is a pure reshape (no NCHW transpose dance,
reference attention.py:237-254).
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from minddiffusion_tpu.core.cfg import cfg_dup
from minddiffusion_tpu.models.layers import GroupNorm32, LayerNormFp32, conv1x1, dense
from minddiffusion_tpu.ops.attention import packed_attention

Dtype = Any


class LoRADense(nn.Module):
    """Dense with a rank-r additive adapter: y = xW + (alpha/r) * x A B.

    Replaces the reference's MindPet `tk.delta.LoRADense` swap
    (wukong-huahua/ldm/modules/attention.py:111-127). A is gaussian-init,
    B zero-init, so enabling LoRA is a no-op until finetuned.
    """

    features: int
    rank: int = 4
    alpha: float = 4.0
    use_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        base = nn.Dense(self.features, use_bias=self.use_bias, dtype=self.dtype,
                        param_dtype=jnp.float32, name="base")(x)
        a = self.param("lora_a", nn.initializers.normal(0.02), (x.shape[-1], self.rank),
                       jnp.float32)
        bm = self.param("lora_b", nn.initializers.zeros, (self.rank, self.features),
                        jnp.float32)
        delta = x @ a.astype(self.dtype) @ bm.astype(self.dtype)
        return base + delta * (self.alpha / self.rank)


class CrossAttention(nn.Module):
    """Multi-head attention over tokens; self-attn when context is None."""

    heads: int
    dim_head: int
    query_dim: int
    context_dim: Optional[int] = None
    dtype: Dtype = jnp.float32
    enable_lora: bool = False
    lora_rank: int = 4
    lora_alpha: float = 4.0
    attn_impl: Optional[str] = None

    def _proj(self, features: int, use_bias: bool, name: str):
        if self.enable_lora:
            return LoRADense(features, rank=self.lora_rank, alpha=self.lora_alpha,
                             use_bias=use_bias, dtype=self.dtype, name=name)
        return dense(features, self.dtype, use_bias=use_bias, name=name)

    @nn.compact
    def __call__(self, x: jnp.ndarray, context: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        inner = self.heads * self.dim_head
        ctx = x if context is None else context
        q = self._proj(inner, False, "to_q")(x)
        hoistable = context is not None and not self.is_initializing()
        if hoistable and self.has_variable("xattn_kv", "k"):
            # Hoisted cross-attention K/V: the text context is constant across
            # every sampler step, so the pipelines capture these projections
            # once OUTSIDE the lax.scan (pipelines _make_eps_fn capture pass)
            # instead of recomputing them 50x inside it.
            k = self.get_variable("xattn_kv", "k")
            v = self.get_variable("xattn_kv", "v")
        else:
            k = self._proj(inner, False, "to_k")(ctx)
            v = self._proj(inner, False, "to_v")(ctx)
            if hoistable and self.is_mutable_collection("xattn_kv"):
                self.put_variable("xattn_kv", "k", k)
                self.put_variable("xattn_kv", "v", v)
        out = packed_attention(q, k, v, self.heads, impl=self.attn_impl)
        return self._proj(self.query_dim, True, "to_out")(out)


class GEGLU(nn.Module):
    dim_out: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = dense(self.dim_out * 2, self.dtype, name="proj")(x)
        h, gate = jnp.split(h, 2, axis=-1)
        return h * nn.gelu(gate)


class FeedForward(nn.Module):
    dim: int
    mult: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = GEGLU(self.dim * self.mult, dtype=self.dtype, name="geglu")(x)
        return dense(self.dim, self.dtype, name="proj_out")(h)


class BasicTransformerBlock(nn.Module):
    dim: int
    heads: int
    dim_head: int
    context_dim: Optional[int] = None
    dtype: Dtype = jnp.float32
    enable_lora: bool = False
    lora_rank: int = 4
    lora_alpha: float = 4.0
    attn_impl: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, context: Optional[jnp.ndarray] = None,
                 cfg_fold=False) -> jnp.ndarray:
        # cfg_fold: False | True (halves layout) | "interleave" (see core.cfg)
        lora = dict(enable_lora=self.enable_lora, lora_rank=self.lora_rank,
                    lora_alpha=self.lora_alpha)
        x = x + CrossAttention(
            heads=self.heads, dim_head=self.dim_head, query_dim=self.dim,
            dtype=self.dtype, attn_impl=self.attn_impl, name="attn1", **lora,
        )(LayerNormFp32(name="norm1")(x))
        if cfg_fold:
            # CFG dedup handoff: everything upstream (UNet prefix, this
            # block's LN + self-attention) ran once at batch B; the two
            # guidance halves first diverge HERE, where context enters.
            # The duplication follows core.cfg's fold layout (halves, or
            # shard-local pairs under mesh serving).
            x = cfg_dup(x, cfg_fold)
        x = x + CrossAttention(
            heads=self.heads, dim_head=self.dim_head, query_dim=self.dim,
            context_dim=self.context_dim, dtype=self.dtype, attn_impl=self.attn_impl,
            name="attn2", **lora,
        )(LayerNormFp32(name="norm2")(x), context=context)
        x = x + FeedForward(self.dim, dtype=self.dtype, name="ff")(
            LayerNormFp32(name="norm3")(x)
        )
        return x


class SpatialTransformer(nn.Module):
    """Transformer over flattened spatial tokens with a conv/linear sandwich."""

    in_channels: int
    heads: int
    dim_head: int
    depth: int = 1
    context_dim: Optional[int] = None
    use_linear: bool = False
    dtype: Dtype = jnp.float32
    enable_lora: bool = False
    lora_rank: int = 4
    lora_alpha: float = 4.0
    attn_impl: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, context: Optional[jnp.ndarray] = None,
                 cfg_fold=False) -> jnp.ndarray:
        # cfg_fold: False | True (halves layout) | "interleave" (see core.cfg)
        b, h, w, c = x.shape
        inner = self.heads * self.dim_head
        residual = x
        x = GroupNorm32(eps=1e-6, name="norm")(x)
        if not self.use_linear:
            x = conv1x1(inner, self.dtype, name="proj_in")(x)
        x = x.reshape(b, h * w, -1)
        if self.use_linear:
            x = dense(inner, self.dtype, name="proj_in")(x)
        for i in range(self.depth):
            x = BasicTransformerBlock(
                dim=inner, heads=self.heads, dim_head=self.dim_head,
                context_dim=self.context_dim, dtype=self.dtype,
                enable_lora=self.enable_lora, lora_rank=self.lora_rank,
                lora_alpha=self.lora_alpha, attn_impl=self.attn_impl,
                name=f"block_{i}",
            )(x, context=context, cfg_fold=cfg_fold if i == 0 else False)
        if self.use_linear:
            x = dense(self.in_channels, self.dtype, zero_init=True, name="proj_out")(x)
        x = x.reshape(x.shape[0], h, w, -1)
        if not self.use_linear:
            x = conv1x1(self.in_channels, self.dtype, zero_init=True, name="proj_out")(x)
        if cfg_fold:
            residual = cfg_dup(residual, cfg_fold)
        return x + residual
