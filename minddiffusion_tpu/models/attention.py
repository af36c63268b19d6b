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

import os
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

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
        if self._use_fused_proj(x, context, inner):
            return self._fused_proj(x, inner)
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
        if self._use_out_proj(x, context, inner):
            # MDT_OUT_PROJ=1: fuse ONLY the to_out projection into the
            # attention kernel epilogue (ops/flash_attention._packed_out_kernel)
            # — q/k/v GEMMs stay with XLA (their in-kernel variant was the
            # measured regression in the full fused-proj experiment).
            from minddiffusion_tpu.ops.attention import packed_out_attention_ad

            wo, bo = _DenseParams(self.query_dim, name="to_out")(inner)
            return packed_out_attention_ad(
                q, k, v, wo, bo, self.dim_head ** -0.5, self.heads,
                self.attn_impl != "pallas_fast")
        out = packed_attention(q, k, v, self.heads, impl=self.attn_impl)
        return self._proj(self.query_dim, True, "to_out")(out)

    def _use_out_proj(self, x, context, inner) -> bool:
        if self.is_initializing():
            return False  # init declares the plain to_out dense params
        n = x.shape[1]
        # same VMEM budget shape as packed_attention's dispatch: K/V blocks
        # (n*inner each, double-buffered) + a bq x n fp32 score tile +
        # q/out tiles + the grid-resident W_o — stay under the kernel's 64M
        # vmem_limit_bytes with margin (large resolutions fall back to the
        # unfused path instead of failing Mosaic's VMEM check). Element size
        # follows the activation dtype: fp32 models double every term.
        esz = jnp.dtype(x.dtype).itemsize
        vmem = (2 * n * inner * esz * 2 + 256 * n * 4 + 256 * inner * 5 * esz
                + inner * self.query_dim * esz)
        return (context is None and not self.enable_lora
                and self.attn_impl != "xla"
                and inner == self.query_dim == x.shape[-1]
                and n >= 1024 and n % 256 == 0
                and vmem <= 48 * 1024 * 1024
                and jax.default_backend() == "tpu"
                and os.environ.get("MDT_OUT_PROJ", "0") == "1")

    def _use_fused_proj(self, x, context, inner) -> bool:
        """Spatial self-attention on TPU: fuse q/k/v/out projections into the
        attention kernel (ops/flash_attention.flash_attention_packed_proj) —
        the projection HBM round-trips (~370 MB per ds1 site) vanish. Square
        projections only (inner == query_dim == x channels), no LoRA (the
        low-rank delta needs the unfused path), token count divisible by the
        q block. Measured e2e-SLOWER (86.3 vs 82.7 ms/step): the in-kernel
        K/V projection GEMMs serialize at grid step 0 and the per-tile out
        projections run at small-GEMM efficiency — together they cost more
        than the ~370 MB/site of HBM round-trips they save. Kept as an
        opt-in experiment (MDT_PROJ_ATTN=1)."""
        import os

        n = x.shape[1]
        return (context is None and not self.enable_lora
                and self.attn_impl != "xla"
                and inner == self.query_dim == x.shape[-1]
                and n >= 1024 and n % 256 == 0
                and 2 * n * inner * 2 <= 12 * 1024 * 1024  # k/v scratch
                and jax.default_backend() == "tpu"
                and os.environ.get("MDT_PROJ_ATTN", "0") == "1")

    def _fused_proj(self, x: jnp.ndarray, inner: int) -> jnp.ndarray:
        from minddiffusion_tpu.ops.attention import fused_proj_attention_ad

        wq = _DenseKernel(inner, name="to_q")(x.shape[-1])
        wk = _DenseKernel(inner, name="to_k")(x.shape[-1])
        wv = _DenseKernel(inner, name="to_v")(x.shape[-1])
        wo, bo = _DenseParams(self.query_dim, name="to_out")(inner)
        return fused_proj_attention_ad(
            x, wq, wk, wv, wo, bo, self.dim_head ** -0.5,
            self.heads, self.attn_impl != "pallas_fast")


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


class _DenseKernel(nn.Module):
    """Declares a bias-free nn.Dense's {kernel} without computing."""

    features: int

    @nn.compact
    def __call__(self, in_features: int):
        return self.param("kernel", nn.initializers.lecun_normal(),
                          (in_features, self.features), jnp.float32)


class _DenseParams(nn.Module):
    """Declares the same {kernel, bias} params nn.Dense would, without compute.

    Lets FusedFeedForward keep a param tree IDENTICAL to the unfused
    LayerNormFp32 + FeedForward stack, so checkpoints and the reference weight
    converter (io/sd_weights.py) are layout-agnostic about the fusion."""

    features: int

    @nn.compact
    def __call__(self, in_features: int):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (in_features, self.features), jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (self.features,),
                       jnp.float32)
        return k, b


class _GEGLUParams(nn.Module):
    features: int

    @nn.compact
    def __call__(self, in_features: int):
        return _DenseParams(self.features, name="proj")(in_features)


class _LNInner(nn.Module):
    dim: int

    @nn.compact
    def __call__(self):
        s = self.param("scale", nn.initializers.ones, (self.dim,), jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (self.dim,), jnp.float32)
        return s, b


class _LNParams(nn.Module):
    """Mirrors LayerNormFp32's param path (<name>/LayerNorm_0/{scale,bias})."""

    dim: int

    @nn.compact
    def __call__(self):
        return _LNInner(self.dim, name="LayerNorm_0")()


class FusedFeedForward(nn.Module):
    """FeedForward with LN + GEGLU + proj + residual fused into one TPU kernel
    (ops/fused_ff.py). Param tree matches FeedForward exactly."""

    dim: int
    mult: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, ln_scale: jnp.ndarray,
                 ln_bias: jnp.ndarray) -> jnp.ndarray:
        from minddiffusion_tpu.ops.fused_ff import fused_ln_geglu_ff

        f = self.dim * self.mult
        w1, b1 = _GEGLUParams(2 * f, name="geglu")(x.shape[-1])
        w2, b2 = _DenseParams(self.dim, name="proj_out")(f)
        # br=1024/subtiles=8: best measured point at the ds1 site (2.698 ms
        # vs 2.825 at the br=256 single-chain default; bench_ff_ds1.py) —
        # sub-chains let Mosaic overlap one chain's VPU gelu with the next
        # chain's MXU matmuls
        return fused_ln_geglu_ff(x, ln_scale, ln_bias, w1, b1, w2, b2,
                                 block_rows=1024, subtiles=8)


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
    # None = auto (fuse LN+GEGLU-FF+residual into one Pallas kernel on TPU);
    # param tree is identical either way (see _DenseParams)
    fuse_ff: Optional[bool] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, context: Optional[jnp.ndarray] = None,
                 cfg_fold: bool = False) -> jnp.ndarray:
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
            # [x; x] matches core.cfg.fold's [uncond; cond] layout.
            x = jnp.concatenate([x, x], axis=0)
        x = x + CrossAttention(
            heads=self.heads, dim_head=self.dim_head, query_dim=self.dim,
            context_dim=self.context_dim, dtype=self.dtype, attn_impl=self.attn_impl,
            name="attn2", **lora,
        )(LayerNormFp32(name="norm2")(x), context=context)
        fuse = self.fuse_ff
        if fuse is None:
            import os

            # opt-in (MDT_FUSE_FF=1): measured e2e-neutral-to-slower than
            # XLA's unfused chain at SD2 shapes despite the HBM-traffic win
            # (K=320 matmul padding + serialized VPU prologue); kept for
            # larger-width models where the weights' VMEM residency pays off.
            # MDT_FUSE_FF=ds1 fuses only the long-token sites (N >= 4096),
            # where the GEGLU intermediate's HBM round-trip is largest and
            # the down-proj is bandwidth-bound (xprof: 87% BW util).
            ff_env = os.environ.get("MDT_FUSE_FF", "0")
            fuse = (jax.default_backend() == "tpu" and self.attn_impl != "xla"
                    and (ff_env == "1"
                         or (ff_env == "ds1" and x.shape[1] >= 4096)))
        if fuse:
            s, b = _LNParams(self.dim, name="norm3")()
            x = FusedFeedForward(self.dim, dtype=self.dtype, name="ff")(x, s, b)
        else:
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
                 cfg_fold: bool = False) -> jnp.ndarray:
        b, h, w, c = x.shape
        inner = self.heads * self.dim_head
        residual = x
        x = GroupNorm32(eps=1e-6, name="norm")(x)
        # MDT_PROJ_NHWC=1: apply the use_linear proj_in/proj_out denses on the
        # 4D NHWC tensor (before flatten / after unflatten). Params and math
        # are identical (nn.Dense contracts the last dim at any rank); the
        # point is XLA's layout choice — token-major (B,N,C) dot outputs get
        # {1,2,0}<->{2,0,1} relayout copies at every proj_out/add (xprof:
        # ~35-40 ms e2e), which spatial-form dots may avoid.
        proj_nhwc = os.environ.get("MDT_PROJ_NHWC", "0") == "1"
        if not self.use_linear:
            x = conv1x1(inner, self.dtype, name="proj_in")(x)
        if self.use_linear and proj_nhwc:
            x = dense(inner, self.dtype, name="proj_in")(x)
        x = x.reshape(b, h * w, -1)
        if self.use_linear and not proj_nhwc:
            x = dense(inner, self.dtype, name="proj_in")(x)
        for i in range(self.depth):
            x = BasicTransformerBlock(
                dim=inner, heads=self.heads, dim_head=self.dim_head,
                context_dim=self.context_dim, dtype=self.dtype,
                enable_lora=self.enable_lora, lora_rank=self.lora_rank,
                lora_alpha=self.lora_alpha, attn_impl=self.attn_impl,
                name=f"block_{i}",
            )(x, context=context, cfg_fold=cfg_fold and i == 0)
        if self.use_linear and not proj_nhwc:
            x = dense(self.in_channels, self.dtype, zero_init=True, name="proj_out")(x)
        x = x.reshape(x.shape[0], h, w, -1)
        if self.use_linear and proj_nhwc:
            x = dense(self.in_channels, self.dtype, zero_init=True, name="proj_out")(x)
        if not self.use_linear:
            x = conv1x1(self.in_channels, self.dtype, zero_init=True, name="proj_out")(x)
        if cfg_fold:
            residual = jnp.concatenate([residual, residual], axis=0)
        return x + residual
