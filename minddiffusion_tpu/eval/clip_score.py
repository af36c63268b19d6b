"""CLIP-score evaluation harness.

BASELINE.md's parity target is "CLIP-score parity" with the reference's
outputs; the reference itself has NO quantitative eval (its only regression
artifacts are golden demo PNGs + pinned seeds,
stablediffusionv2/README.md:60-100, scripts/infer.sh:29). This harness is the
framework's quantitative replacement: score = cos(image_emb, text_emb) * 100
in the joint CLIP space, the standard CLIPScore definition (Hessel et al.,
w=2.5 variant left to callers).

The scorer owns BOTH towers (models/clip_vision.CLIPVisionEncoder + a pooled
projection head over models/clip.CLIPTextEncoder), because diffusion
checkpoints carry only the text tower without the joint-space projection.
Weights come from an OpenCLIP checkpoint via `io/` converters once one is
staged; everything here is weight-agnostic and tested with random params
(tests/test_clip_score.py).

Whole-batch scoring is ONE jitted program: uint8 -> CLIP preprocess (resize
224, normalize) -> both towers -> cosine. Bicubic resize matches OpenCLIP's
torchvision default.
"""
from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax import struct

from minddiffusion_tpu.models.clip import CLIPTextConfig, CLIPTextEncoder
from minddiffusion_tpu.models.clip_vision import CLIPVisionConfig, CLIPVisionEncoder

# OpenCLIP normalization constants
_MEAN = (0.48145466, 0.4578275, 0.40821073)
_STD = (0.26862954, 0.26130258, 0.27577711)


def preprocess_uint8(images: jnp.ndarray, size: int = 224) -> jnp.ndarray:
    """(B, H, W, 3) uint8 -> (B, size, size, 3) fp32 CLIP-normalized.

    Bicubic resize of the full frame (no center crop: generated images are
    square already; callers crop beforehand if not).
    """
    x = images.astype(jnp.float32) / 255.0
    b, h, w, c = x.shape
    if (h, w) != (size, size):
        x = jax.image.resize(x, (b, size, size, c), method="bicubic")
        x = jnp.clip(x, 0.0, 1.0)
    return (x - jnp.asarray(_MEAN)) / jnp.asarray(_STD)


@struct.dataclass
class CLIPScoreConfig:
    vision: CLIPVisionConfig
    text: CLIPTextConfig

    @classmethod
    def vit_h14(cls, dtype=jnp.float32) -> "CLIPScoreConfig":
        # FULL OpenCLIP ViT-H text tower: 24 layers (SD2's encoder is the
        # same tower truncated to 23) and exact erf GELU — eval weights come
        # straight from an OpenCLIP checkpoint, not from an SD checkpoint.
        return cls(vision=CLIPVisionConfig.vit_h14(dtype=dtype),
                   text=CLIPTextConfig(width=1024, layers=24, heads=16,
                                       use_exact_gelu=True, dtype=dtype))

    @classmethod
    def vit_l14(cls, dtype=jnp.float32) -> "CLIPScoreConfig":
        """OpenAI ViT-L/14 (the SD1/wukong pair) — quick-GELU towers."""
        return cls(vision=CLIPVisionConfig.vit_l14(dtype=dtype),
                   text=CLIPTextConfig(width=768, layers=12, heads=12,
                                       use_quick_gelu=True, dtype=dtype))

    @classmethod
    def tiny(cls) -> "CLIPScoreConfig":
        """Test-sized towers (fast CPU init/apply)."""
        return cls(
            vision=CLIPVisionConfig(image_size=32, patch_size=8, width=64,
                                    layers=2, heads=2, embed_dim=32),
            text=CLIPTextConfig(vocab_size=128, width=48, layers=2, heads=2,
                                context_length=16),
        )


class CLIPScorer(nn.Module):
    """images (CLIP-normalized) + token ids -> per-pair CLIP score."""

    config: CLIPScoreConfig

    def setup(self):
        self.visual = CLIPVisionEncoder(self.config.vision, name="visual")
        self.text = CLIPTextEncoder(self.config.text, name="text")
        # pooled text head: take the EOT position of the final-LN sequence
        # and project into the joint space (OpenCLIP text_projection)
        self.text_projection = self.param(
            "text_projection",
            nn.initializers.normal(self.config.text.width ** -0.5),
            (self.config.text.width, self.config.vision.embed_dim),
        )

    def encode_image(self, images: jnp.ndarray) -> jnp.ndarray:
        emb = self.visual(images)
        return emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)

    def encode_text(self, tokens: jnp.ndarray) -> jnp.ndarray:
        seq = self.text(tokens)                       # (B, L, W) fp32
        # EOT = highest token id in CLIP vocabs (argmax convention)
        eot = jnp.argmax(tokens, axis=-1)
        pooled = jnp.take_along_axis(seq, eot[:, None, None], axis=1)[:, 0]
        emb = pooled @ self.text_projection
        return emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)

    def __call__(self, images: jnp.ndarray, tokens: jnp.ndarray) -> jnp.ndarray:
        """Pairwise score (B,): 100 * cos(image_i, text_i)."""
        ie = self.encode_image(images)
        te = self.encode_text(tokens)
        return 100.0 * jnp.sum(ie * te, axis=-1)


def clip_score_fn(config: CLIPScoreConfig):
    """Returns (params, images_uint8, tokens) -> (B,) scores, jit-ready."""
    scorer = CLIPScorer(config)

    def fn(params, images_uint8: jnp.ndarray, tokens: jnp.ndarray) -> jnp.ndarray:
        images = preprocess_uint8(images_uint8, config.vision.image_size)
        return scorer.apply(params, images, tokens)

    return scorer, fn
