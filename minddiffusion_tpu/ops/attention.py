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


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def _packed_ad(q, k, v, scale, heads, block_q, exact, variant):
    from minddiffusion_tpu.ops import flash_attention

    fn = {"packed": flash_attention.flash_attention_packed,
          "ones": flash_attention.flash_attention_packed_ones,
          "fold": flash_attention.flash_attention_packed_fold}[variant]
    return fn(q, k, v, scale, heads, block_q=block_q, exact=exact)


def _packed_ad_fwd(q, k, v, scale, heads, block_q, exact, variant):
    return _packed_ad(q, k, v, scale, heads, block_q, exact, variant), (q, k, v)


def _packed_ad_bwd(scale, heads, block_q, exact, variant, res, g):
    q, k, v = res
    _, vjp = jax.vjp(
        lambda a, b, c: _einsum_packed(a, b, c, scale, heads), q, k, v)
    return vjp(g)


_packed_ad.defvjp(_packed_ad_fwd, _packed_ad_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def fused_proj_attention_ad(x, wq, wk, wv, wo, bo, scale, heads, exact):
    from minddiffusion_tpu.ops import flash_attention

    return flash_attention.flash_attention_packed_proj(
        x, wq, wk, wv, wo, bo, scale=scale, heads=heads, exact=exact)


def _proj_ref(x, wq, wk, wv, wo, bo, scale, heads):
    dt = x.dtype
    y = _einsum_packed(x @ wq.astype(dt), x @ wk.astype(dt),
                       x @ wv.astype(dt), scale, heads)
    return y @ wo.astype(dt) + bo.astype(dt)


def _proj_ad_fwd(x, wq, wk, wv, wo, bo, scale, heads, exact):
    return (fused_proj_attention_ad(x, wq, wk, wv, wo, bo, scale, heads, exact),
            (x, wq, wk, wv, wo, bo))


def _proj_ad_bwd(scale, heads, exact, res, g):
    _, vjp = jax.vjp(
        lambda x, a, b, c, d, e: _proj_ref(x, a, b, c, d, e, scale, heads),
        *res)
    return vjp(g)


fused_proj_attention_ad.defvjp(_proj_ad_fwd, _proj_ad_bwd)


# VMEM budget for the packed (heads-unsplit) kernel: K, V and a q tile's score
# row must fit on-chip together.
_PACKED_VMEM_BUDGET = 12 * 1024 * 1024


def packed_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    heads: int,
    scale: Optional[float] = None,
    impl: Optional[str] = None,
) -> jnp.ndarray:
    """Attention on packed (B, N, C=H*D) tensors — the model's native layout.

    On TPU at spatial lengths this dispatches to the heads-packed Pallas
    kernel, which never materializes a head transpose (the (B,H,N,D) relayout
    copies cost real HBM time in-graph) and loads K/V once per q tile for all
    heads. Falls back to the head-split paths otherwise.
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
    if (impl in (None, "pallas_fast") and q.shape[1] >= _PALLAS_MIN_TOKENS
            and nk >= 512 and _pallas_available()):
        # bq256 runs the exact path ~10% faster than bq128 when the score
        # tile fits; fall back to 128 for long keys. MDT_ATTN_BQ overrides
        # for A/B (GLIDE's short-nk sites run 75T vs SD's 96T — a larger
        # q tile amortizes the per-tile K/V reload at small nk).
        import os as _os

        _bq_env = _os.environ.get("MDT_ATTN_BQ")
        bq = 256 if 256 * nk * 4 <= 6 * 1024 * 1024 else 128
        if _bq_env:
            bq = min(int(_bq_env), nq) if int(_bq_env) * nk * 4 \
                <= 24 * 1024 * 1024 else bq
        # enforced footprint: double-buffered K/V blocks + q/out tiles. The
        # bq x nk fp32 score tile is deliberately EXCLUDED from the budget —
        # it scales with the same nk the K/V term already gates on, and the
        # shipped budget value was tuned e2e with this exact condition.
        vmem = nk * c * 2 * 2 + bq * c * 6
        if vmem <= _PACKED_VMEM_BUDGET:
            from minddiffusion_tpu.ops import flash_attention

            import os

            if impl == "pallas_fast":
                # raw-exp softmax (no shift; exact below logit 88): no max
                # pass — serving opt-in. MDT_FOLD_ATTN=1 additionally folds
                # the softmax row-sum into the PV matmul via in-kernel
                # scratch V-augment (d=64 only).
                if (os.environ.get("MDT_FOLD_ATTN", "0") == "1"
                        and c // heads == 64):
                    return _packed_ad(q, k, v, float(scale), heads, bq,
                                      False, "fold")
                return _packed_ad(q, k, v, float(scale), heads, bq,
                                  False, "packed")
            # ones-column fold (row-sum rides the PV matmul) via host-side
            # V-augment concat: e2e-slower (the concat costs real HBM);
            # superseded by the in-kernel MDT_FOLD_ATTN variant above.
            if os.environ.get("MDT_ONES_ATTN", "0") == "1":
                return _packed_ad(q, k, v, float(scale), heads, bq,
                                  True, "ones")
            return _packed_ad(q, k, v, float(scale), heads, bq,
                              True, "packed")
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


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def packed_out_attention_ad(q, k, v, wo, bo, scale, heads, exact):
    """attention + fused out-projection (flash_attention_packed_out) with an
    einsum-recompute backward (the Pallas kernel is not linearizable)."""
    from minddiffusion_tpu.ops import flash_attention

    return flash_attention.flash_attention_packed_out(
        q, k, v, wo, bo, scale=scale, heads=heads, exact=exact)


def _out_ref(q, k, v, wo, bo, scale, heads):
    y = _einsum_packed(q, k, v, scale, heads)
    return y @ wo.astype(y.dtype) + bo.astype(y.dtype)


def _out_ad_fwd(q, k, v, wo, bo, scale, heads, exact):
    return (packed_out_attention_ad(q, k, v, wo, bo, scale, heads, exact),
            (q, k, v, wo, bo))


def _out_ad_bwd(scale, heads, exact, res, g):
    _, vjp = jax.vjp(
        lambda a, b, c, d, e: _out_ref(a, b, c, d, e, scale, heads), *res)
    return vjp(g)


packed_out_attention_ad.defvjp(_out_ad_fwd, _out_ad_bwd)
