"""Attention dispatch: XLA einsum reference path + Pallas TPU kernel.

The reference computes plain `softmax(QK^T * scale) V`, materializing the full
(B*heads, N, N) score tensor (stablediffusionv2/ldm/modules/attention.py:138-152,
and equivalents in model.py:182-206, unet.py:286-310, xf.py:82-97). At 512x512
the first SD attention level self-attends over 64*64 = 4096 tokens, so that
tensor is the documented memory limiter of the reference (wukong
README_EN.md:60). Here the hot path is a Pallas kernel that never materializes
more than a (block_q, Nk) tile of scores in VMEM (ops/flash_attention.py);
everything else uses the einsum path, which XLA fuses fine for short contexts.

Tensor convention: (B, N, H, D) — batch, tokens, heads, head_dim.
Softmax statistics are always fp32 regardless of the activation dtype.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp


# Token count above which the Pallas kernel is preferred on TPU. Short
# (cross-attention, text-encoder) sequences stay on the XLA path: the score
# tensor is tiny and XLA's fusion wins.
_PALLAS_MIN_TOKENS = 1024


def einsum_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: Optional[float] = None,
    bias: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Reference attention: fp32 softmax over bf16 matmuls. (B, N, H, D)."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    scores = scores * jnp.float32(scale)
    if bias is not None:
        scores = scores + bias.astype(jnp.float32)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    return out.astype(q.dtype)


@functools.lru_cache(maxsize=4)
def _pallas_importable() -> bool:
    try:
        from minddiffusion_tpu.ops import flash_attention  # noqa: F401
        return True
    except ImportError:  # pragma: no cover - exotic partial installs only
        return False


def _pallas_available() -> bool:
    # The backend is re-checked per call (NOT baked into the cache): the
    # documented workflow flips jax_platforms in-process (CLAUDE.md), and a
    # frozen first answer would either dispatch TPU kernels on CPU or
    # silently disable them on TPU for the process lifetime.
    return jax.default_backend() == "tpu" and _pallas_importable()


def dot_product_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: Optional[float] = None,
    bias: Optional[jnp.ndarray] = None,
    impl: Optional[str] = None,
) -> jnp.ndarray:
    """Scaled dot-product attention with automatic TPU-kernel dispatch.

    q: (B, Nq, H, D); k, v: (B, Nk, H, D). Returns (B, Nq, H, D) in q.dtype.
    impl: None (auto) | "xla" | "pallas".
    """
    if impl is None:
        use_pallas = (
            bias is None
            and q.shape[1] >= _PALLAS_MIN_TOKENS
            and k.shape[1] >= 512   # short-key cross-attn: einsum wins
            and _pallas_available()
        )
        impl = "pallas" if use_pallas else "xla"
    if impl == "pallas":
        if bias is not None:
            raise ValueError(
                "impl='pallas' does not support bias/masks — use impl='xla' "
                "(the auto path routes biased attention there itself)")
        return _flash_ad(q, k, v,
                         float(scale) if scale is not None else q.shape[-1] ** -0.5)
    return einsum_attention(q, k, v, scale=scale, bias=bias)


# ---- autodiff bridges -------------------------------------------------------
# Pallas kernels have no automatic VJP: differentiating through a pallas_call
# fails outright (JAX cannot linearize the custom lowering). Every Pallas
# dispatch below is therefore wrapped in a custom_vjp whose BACKWARD pass
# recomputes the reference einsum attention and differentiates that — serving
# keeps the fused kernels, training gets correct gradients with the memory
# profile of the reference's own full-softmax attention (its training batch
# sizes fit that by construction: stablediffusionv2 train_config bs 3-10).


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _flash_ad(q, k, v, scale):
    from minddiffusion_tpu.ops import flash_attention

    return flash_attention.flash_attention(q, k, v, scale=scale)


def _flash_ad_fwd(q, k, v, scale):
    return _flash_ad(q, k, v, scale), (q, k, v)


def _flash_ad_bwd(scale, res, g):
    q, k, v = res
    _, vjp = jax.vjp(lambda a, b, c: einsum_attention(a, b, c, scale=scale),
                     q, k, v)
    return vjp(g)


_flash_ad.defvjp(_flash_ad_fwd, _flash_ad_bwd)


def _einsum_packed(q, k, v, scale, heads):
    b, nq, c = q.shape
    nk = k.shape[1]
    d = c // heads
    out = einsum_attention(q.reshape(b, nq, heads, d),
                           k.reshape(b, nk, heads, d),
                           v.reshape(b, nk, heads, d), scale=scale)
    return out.reshape(b, nq, c)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _packed_ad(q, k, v, scale, heads, block_q, exact):
    from minddiffusion_tpu.ops import flash_attention

    return flash_attention.flash_attention_packed(
        q, k, v, scale, heads, block_q=block_q, exact=exact)


def _packed_ad_fwd(q, k, v, scale, heads, block_q, exact):
    return _packed_ad(q, k, v, scale, heads, block_q, exact), (q, k, v)


def _packed_ad_bwd(scale, heads, block_q, exact, res, g):
    q, k, v = res
    _, vjp = jax.vjp(
        lambda a, b, c: _einsum_packed(a, b, c, scale, heads), q, k, v)
    return vjp(g)


_packed_ad.defvjp(_packed_ad_fwd, _packed_ad_bwd)


# VMEM budget for the packed (heads-unsplit) kernel: K, V and a q tile's score
# row must fit on-chip together.
_PACKED_VMEM_BUDGET = 12 * 1024 * 1024
# fp32 score-tile budget gating the q-block choice (and the block_q
# call-site hint) — one constant for both.
_SCORE_TILE_BUDGET = 6 * 1024 * 1024


def packed_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    heads: int,
    scale: Optional[float] = None,
    impl: Optional[str] = None,
    block_q: Optional[int] = None,
    min_q: Optional[int] = None,
) -> jnp.ndarray:
    """Attention on packed (B, N, C=H*D) tensors — the model's native layout.

    On TPU at spatial lengths this dispatches to the heads-packed Pallas
    kernel, which never materializes a head transpose (the (B,H,N,D) relayout
    copies cost real HBM time in-graph) and loads K/V once per q tile for all
    heads. Falls back to the head-split paths otherwise.

    `min_q`: route-threshold override (both the q-length and the nk gate) —
    A/B surface for mid-length self-attention sites (GLIDE's 16² tiers:
    nq=256, nk=384); the default gates were tuned on SD shapes.
    """
    b, nq, c = q.shape
    nk = k.shape[1]
    d = c // heads
    if scale is None:
        scale = d ** -0.5
    # Short-key cross-attention (Nk=77 text context) runs at ~18T in the
    # packed kernel (16 q-tiles x heads of tiny matmuls, program-overhead
    # bound) vs XLA's fused einsum; route it to the einsum path. Profile:
    # 354us -> target <150us per ds1 cross site.
    gate_q = min_q if min_q is not None else _PALLAS_MIN_TOKENS
    gate_k = min_q if min_q is not None else 512
    if (impl in (None, "pallas_fast") and nq >= gate_q
            and nk >= gate_k and nk % 128 == 0 and _pallas_available()):
        # bq256 runs the exact path ~10% faster than bq128 when the score
        # tile fits; fall back to 128 for long keys. The single documented
        # score-tile budget: bq * nk * 4 (fp32) <= _SCORE_TILE_BUDGET.
        bq = 256 if 256 * nk * 4 <= _SCORE_TILE_BUDGET else 128
        # call-site hint (e.g. GLIDE passes 1024: its short-nk sites measured
        # 2.005 vs 1.999 img/s with the whole-nq tile — the larger q tile
        # amortizes the per-tile K/V reload at small nk). The MDT_ATTN_BQ
        # env override was retired in r5 (its winning value is this hint;
        # every other value measured worse — ROADMAP "ds1 anatomy").
        if block_q:
            # Rounded DOWN to a 128 multiple; ignored unless it divides the
            # q length and fits the same score-tile budget (ADVICE r3: an
            # unaligned/non-dividing value crashed at Mosaic trace time).
            cand = min(block_q - block_q % 128, nq)
            if (cand >= 128 and nq % cand == 0
                    and cand * nk * 4 <= _SCORE_TILE_BUDGET):
                bq = cand
        # enforced footprint: double-buffered K/V blocks + q/out tiles. The
        # bq x nk fp32 score tile is deliberately EXCLUDED from the budget —
        # it scales with the same nk the K/V term already gates on, and the
        # shipped budget value was tuned e2e with this exact condition.
        vmem = nk * c * 2 * 2 + bq * c * 6
        if vmem <= _PACKED_VMEM_BUDGET:
            # impl == "pallas_fast": raw-exp softmax (no shift; exact below
            # logit 88, far above SD-scale logits) — serving opt-in.
            return _packed_ad(q, k, v, float(scale), heads, bq,
                              impl != "pallas_fast")
    if impl == "pallas_fast":
        impl = None
    out = dot_product_attention(
        q.reshape(b, nq, heads, d),
        k.reshape(b, nk, heads, d),
        v.reshape(b, nk, heads, d),
        scale=scale,
        impl=impl,
    )
    return out.reshape(b, nq, c)

