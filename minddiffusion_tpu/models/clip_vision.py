"""CLIP ViT image tower (flax.linen) — the evaluation-side counterpart of
models/clip.py's text encoders.

The reference repo ships no image tower and no quantitative eval at all (its
regression story is golden demo PNGs, stablediffusionv2/README.md:60-100);
this tower exists so the framework can compute CLIP scores for generated
images (eval/clip_score.py) — the metric BASELINE.md names for parity. The
architecture is the standard OpenCLIP ViT so published OpenCLIP weights can
be mapped onto it (ViT-H/14 matches the SD2 text encoder's training pair;
ViT-L/14 matches SD1/wukong's).

TPU-first: NHWC patchify as one stride-P conv (a single MXU matmul over
P*P*3 -> width), batch-major (B, L, W) tokens, non-causal attention through
the shared einsum op (257/577-token sequences are XLA-fusion territory, no
Pallas needed), fp32 LayerNorms over bf16 matmuls.
"""
from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn
from flax import struct

from minddiffusion_tpu.models.clip import (ResidualAttentionBlock, exact_gelu,
                                            quick_gelu)
from minddiffusion_tpu.models.layers import LayerNormFp32

Dtype = Any


@struct.dataclass
class CLIPVisionConfig:
    image_size: int = 224
    patch_size: int = 14
    width: int = 1280
    layers: int = 32
    heads: int = 16
    embed_dim: int = 1024          # joint text/image space
    # OpenAI-trained CLIP ViTs (L/14) use QuickGELU; laion OpenCLIP (H/14)
    # uses exact erf GELU
    use_quick_gelu: bool = False
    dtype: Any = struct.field(pytree_node=False, default=jnp.float32)

    @classmethod
    def vit_h14(cls, **kw) -> "CLIPVisionConfig":
        """OpenCLIP ViT-H/14 (the SD2 encoder's pair)."""
        return cls(width=1280, layers=32, heads=16, embed_dim=1024, **kw)

    @classmethod
    def vit_l14(cls, **kw) -> "CLIPVisionConfig":
        """OpenAI/OpenCLIP ViT-L/14 (the SD1/wukong pair)."""
        kw.setdefault("use_quick_gelu", True)
        return cls(width=1024, layers=24, heads=16, embed_dim=768, **kw)

    @property
    def grid(self) -> int:
        return self.image_size // self.patch_size


class CLIPVisionEncoder(nn.Module):
    """images (B, H, W, 3) fp32 (CLIP-normalized) -> (B, embed_dim) fp32."""

    config: CLIPVisionConfig

    @nn.compact
    def __call__(self, images: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        b = images.shape[0]
        p = cfg.patch_size
        # patchify: one stride-P VALID conv, no bias (OpenCLIP convention)
        x = nn.Conv(cfg.width, (p, p), strides=(p, p), padding="VALID",
                    use_bias=False, dtype=cfg.dtype, param_dtype=jnp.float32,
                    name="patch_embed")(images.astype(cfg.dtype))
        x = x.reshape(b, -1, cfg.width)                      # (B, grid², W)

        cls_emb = self.param("class_embedding", nn.initializers.normal(0.02),
                             (cfg.width,), jnp.float32)
        pos_emb = self.param("positional_embedding", nn.initializers.normal(0.01),
                             (cfg.grid * cfg.grid + 1, cfg.width), jnp.float32)
        cls_tok = jnp.broadcast_to(cls_emb.astype(cfg.dtype)[None, None],
                                   (b, 1, cfg.width))
        x = jnp.concatenate([cls_tok, x], axis=1)
        x = x + pos_emb[None].astype(cfg.dtype)

        x = LayerNormFp32(name="ln_pre")(x).astype(cfg.dtype)
        zero_bias = jnp.zeros((1, 1, 1, x.shape[1]), jnp.float32)
        # exact erf GELU (torch nn.GELU) for laion OpenCLIP weights, QuickGELU
        # for OpenAI-trained ones — this tower exists to carry those weights
        act = quick_gelu if cfg.use_quick_gelu else exact_gelu
        for i in range(cfg.layers):
            x = ResidualAttentionBlock(cfg.heads, act, cfg.dtype,
                                       name=f"resblock_{i}")(x, zero_bias)
        pooled = LayerNormFp32(name="ln_post")(x[:, 0])
        proj = self.param("proj", nn.initializers.normal(cfg.width ** -0.5),
                          (cfg.width, cfg.embed_dim), jnp.float32)
        return (pooled.astype(cfg.dtype) @ proj.astype(cfg.dtype)).astype(jnp.float32)
