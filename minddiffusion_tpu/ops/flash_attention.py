"""Pallas TPU fused attention kernel (q-blockwise, online softmax).

Replaces the reference's full-score-tensor attention
(stablediffusionv2/ldm/modules/attention.py:138-152) on the spatial
self-attention hot path. Design:

  * Grid: (batch*heads, Nq / BLOCK_Q, Nk / BLOCK_K). The K dimension is the
    innermost (fastest-varying) grid axis, so for each q tile we sweep k/v
    tiles while the output tile stays resident in VMEM.
  * Online softmax: running row-max `m`, normalizer `l`, and the un-normalized
    accumulator live in fp32 VMEM scratch that persists across the K sweep.
    When the whole key sequence fits one block the rescale bookkeeping is
    skipped entirely (single-pass path).
  * QK^T and PV ride the MXU in the input dtype (bf16 on TPU) with fp32
    accumulation; softmax math is fp32 on the VPU. The softmax scale is
    folded into the q tile *before* the matmul — one fewer VPU pass over the
    (BLOCK_Q, BLOCK_K) score tile, which matters because this kernel is
    VPU-bound at SD's head_dim=64 (profiled: ds1 attention = 68% of the SD2
    UNet step, ~12 VPU lane-ops per score vs 256 MXU flops).
  * `exact_softmax=False` drops the running-max pass and uses a static-shift
    softmax exp(s - shift): mathematically identical after normalization as
    long as scores stay below shift+88 (fp32 exp overflow); SD-scale logits
    sit far below that. Default remains the exact online softmax.
  * Nothing of size Nq*Nk ever exists: VMEM footprint is
    O(BLOCK_Q*D + BLOCK_K*D + BLOCK_Q*BLOCK_K), so 768x768 latents
    (9216 tokens) compile with the same kernel.

Numerics are validated against the fp32 einsum path in
tests/test_flash_attention.py (interpret mode on CPU, compiled on TPU).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = float("-inf")
_FAST_SHIFT = 20.0  # static softmax shift for exact_softmax=False


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref, *,
                 scale: float, exact: bool):
    """One (q tile, k tile) step of the online-softmax sweep."""
    k_idx = pl.program_id(2)
    nk = pl.num_programs(2)
    single = nk == 1  # python-static: grid shape is known at trace time

    q = (q_ref[0].astype(jnp.float32) * scale).astype(q_ref.dtype)  # (BQ, D)
    k = k_ref[0]  # (BK, D)
    v = v_ref[0]  # (BK, D)

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (BQ, BK) fp32

    if single:
        # one k block: no carry, no rescale
        if exact:
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
        else:
            p = jnp.exp(s - _FAST_SHIFT)
        l = jnp.sum(p, axis=-1, keepdims=True)
        acc = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[0] = (acc / l).astype(o_ref.dtype)
        return

    @pl.when(k_idx == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    if exact:
        m_prev = m_ref[:]  # (BQ, 128); all columns equal
        m_cur = jnp.max(s, axis=-1, keepdims=True)  # (BQ, 1)
        m_next = jnp.maximum(m_prev, jnp.broadcast_to(m_cur, m_prev.shape))
        p = jnp.exp(s - m_next[:, :1])
        alpha = jnp.exp(m_prev - m_next)
        l_ref[:] = l_ref[:] * alpha + jnp.broadcast_to(
            jnp.sum(p, axis=-1, keepdims=True), l_ref.shape)
        acc_ref[:] = acc_ref[:] * alpha[:, :1]
        m_ref[:] = m_next
    else:
        p = jnp.exp(s - _FAST_SHIFT)
        l_ref[:] += jnp.broadcast_to(jnp.sum(p, axis=-1, keepdims=True), l_ref.shape)

    acc_ref[:] += jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(k_idx == nk - 1)
    def _finalize():
        o_ref[0] = (acc_ref[:] / l_ref[:, :1]).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("scale", "block_q", "block_k", "exact", "interpret"),
)
def _flash_bhnd(
    q: jnp.ndarray,  # (BH, Nq, D)
    k: jnp.ndarray,  # (BH, Nk, D)
    v: jnp.ndarray,
    scale: float,
    block_q: int,
    block_k: int,
    exact: bool = True,
    interpret: bool = False,
) -> jnp.ndarray:
    bh, nq, d = q.shape
    nk = k.shape[1]
    grid = (bh, pl.cdiv(nq, block_q), pl.cdiv(nk, block_k))

    kernel = functools.partial(_attn_kernel, scale=scale, exact=exact)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, nq, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),  # running max
            pltpu.VMEM((block_q, 128), jnp.float32),  # running sum
            pltpu.VMEM((block_q, d), jnp.float32),    # output accumulator
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * nq * nk * d,
            bytes_accessed=2 * bh * (nq + 2 * nk) * d,
            transcendentals=bh * nq * nk,
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(q, k, v)


# A bnhd-blocked variant (_flash_bnhd: (1, bq, 1, D) BlockSpec slices of the
# native (B, N, H, D) tensors, no host head-transpose) was measured at
# 57 TFLOP/s vs 61 for the packed kernel at SD ds1 shapes and removed — the
# packed layout below is strictly better; see README "Performance".


def _packed_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, exact: bool,
                   heads: int, head_dim: int, grouped: bool = False):
    """Heads-packed single-k-block kernel.

    Blocks are (1, bq, C) / (1, Nk, C) slices of the native (B, N, C=H*D)
    tensors — the channel axis is never blocked (block dim == array dim, which
    Mosaic allows), so NO head-transpose copies exist anywhere. Heads are
    processed by an in-kernel python loop over 64-lane slices; K/V tiles are
    DMA'd once per (batch, q-tile) and reused by every head.

    Fast (exact=False) softmax uses raw exp(s) with NO shift: softmax is
    shift-invariant after the acc/l division, so the shift's only job is
    fp32-exp overflow safety (s > ~88). SD attention logits sit |s| < ~30;
    dropping the subtraction removes one full VPU pass over the score tile.

    grouped=True splits the per-head loop into phases (all QK^T matmuls,
    then all exp/sum, then all PV) so Mosaic can overlap head h+1's MXU work
    with head h's VPU softmax.
    """
    def qk(h):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        q = (q_ref[0][:, sl].astype(jnp.float32) * scale).astype(q_ref.dtype)
        k = k_ref[0][:, sl]
        return jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)

    def softmax_p(s):
        if exact:
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
        else:
            p = jnp.exp(s)
        return p, jnp.sum(p, axis=-1, keepdims=True)

    def pv(h, p, l):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        v = v_ref[0][:, sl]
        acc = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        o_ref[0, :, sl] = (acc / l).astype(o_ref.dtype)

    if grouped:
        ss = [qk(h) for h in range(heads)]
        pls = [softmax_p(s) for s in ss]
        for h, (p, l) in enumerate(pls):
            pv(h, p, l)
    else:
        for h in range(heads):
            p, l = softmax_p(qk(h))
            pv(h, p, l)


@functools.partial(
    jax.jit,
    static_argnames=("scale", "heads", "block_q", "exact", "grouped",
                     "interpret"),
)
def flash_attention_packed(
    q: jnp.ndarray,  # (B, Nq, C)
    k: jnp.ndarray,  # (B, Nk, C)
    v: jnp.ndarray,
    scale: float,
    heads: int,
    block_q: int = 256,
    exact: bool = True,
    grouped: bool = False,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused attention over packed heads; whole K per block (Nk <= ~4096)."""
    b, nq, c = q.shape
    nk = k.shape[1]
    d = c // heads
    qb = min(block_q, nq)
    pad = (-nq) % qb
    if pad:
        q = jnp.pad(q, ((0, 0), (0, pad), (0, 0)))
    grid = (b, pl.cdiv(nq + pad, qb))
    kernel = functools.partial(_packed_kernel, scale=scale, exact=exact,
                               heads=heads, head_dim=d, grouped=grouped)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, qb, c), lambda b_, i: (b_, i, 0)),
            pl.BlockSpec((1, nk, c), lambda b_, i: (b_, 0, 0)),
            pl.BlockSpec((1, nk, c), lambda b_, i: (b_, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, qb, c), lambda b_, i: (b_, i, 0)),
        out_shape=jax.ShapeDtypeStruct((b, nq + pad, c), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * heads * nq * nk * d,
            bytes_accessed=2 * b * (nq + 2 * nk) * c,
            transcendentals=b * heads * nq * nk,
        ),
        # double-buffered K/V at Nk*C can exceed XLA's default 16M scoped-vmem
        # budget; v5e has 128M physical VMEM, so allow more
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(q, k, v)
    return out[:, :nq]


def _pad_tokens(x: jnp.ndarray, block: int) -> jnp.ndarray:
    n = x.shape[1]
    pad = (-n) % block
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
    return x


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: Optional[float] = None,
    block_q: int = 512,
    block_k: int = 4096,
    exact_softmax: bool = True,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused attention. q: (B, Nq, H, D); k, v: (B, Nk, H, D) -> (B, Nq, H, D).

    Q is zero-padded to the block size (padded rows are sliced off). For a
    non-divisible Nk the k block shrinks to a divisor so no padded keys ever
    enter the softmax.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    b, nq, h, d = q.shape
    nk = k.shape[1]

    qb = min(block_q, max(8, nq))
    kb = min(block_k, max(128, nk))
    # budget the on-chip footprint (double-buffered k/v tiles + the fp32
    # score tile dominate); large head dims (VAE: single head, D=512) would
    # otherwise blow the compiler's scoped-vmem stack
    def footprint(qb_, kb_):
        return 2 * 2 * (kb_ * d * 2) + qb_ * kb_ * 4 + 4 * qb_ * d + qb_ * 1024
    budget = 10 * 1024 * 1024
    while footprint(qb, kb) > budget and kb > 512:
        kb //= 2
    while footprint(qb, kb) > budget and qb > 128:
        qb //= 2
    if nk % kb:
        kb = _largest_divisor_block(nk, kb)

    # NOTE: a head-sliced (B, N, H, D) BlockSpec would avoid these transposes
    # but Mosaic requires the last two block dims to tile (8, 128) or equal
    # the array dims — a mid-axis H slice violates that. The transposes are
    # cheap relative to the kernel (XLA fuses them into neighbors).
    def to_bhnd(x):
        return x.transpose(0, 2, 1, 3).reshape(b * h, x.shape[1], d)

    q_, k_, v_ = to_bhnd(q), to_bhnd(k), to_bhnd(v)
    if nq % qb:
        q_ = _pad_tokens(q_, qb)
    out = _flash_bhnd(q_, k_, v_, float(scale), qb, kb, exact_softmax, interpret)
    out = out[:, :nq]
    return out.reshape(b, h, nq, d).transpose(0, 2, 1, 3)


def _largest_divisor_block(n: int, max_block: int) -> int:
    for cand in range(min(max_block, n), 0, -1):
        if n % cand == 0 and (cand % 128 == 0 or cand == n):
            return cand
    return n


