"""STATUS: REJECTED experimental attention-kernel variants (kept for the
record; NOT imported by the shipping package).

Moved out of ops/flash_attention.py in r4 flag hygiene. E2e measurements
(ROADMAP.md "Tried and rejected" / "ds1 self-attention anatomy"):
  * packed_ones (host-side V-augment ones-fold): e2e-slower — the concat
    costs real HBM traffic.
  * packed_fold (in-kernel scratch ones-fold): 5.19 ms/site, no change vs
    the shipped kernel (the row-sum is already overlap-free).
  * packed_proj (q/k/v/out projections fused in-kernel): 86.3 vs 82.7
    ms/step — in-kernel K/V GEMMs serialize at grid step 0.
  * packed_out (out-projection-only epilogue): never beat the unfused
    composition e2e.
All variants remain numerically correct (they passed the parity tests that
shipped with them)."""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from minddiffusion_tpu.ops.flash_attention import (
    _FAST_SHIFT, _pad_tokens, _largest_divisor_block)

def _packed_ones_kernel(q_ref, k_ref, va_ref, o_ref, *, scale: float,
                        exact: bool, heads: int, head_dim: int):
    """Heads-packed kernel with the softmax row-sum folded into the PV matmul.

    V is augmented per head to 2*d lanes: [v_h | 1 | 0 ...]. The PV product
    then yields [sum(p*v) | sum(p)] in one MXU op — at d=64 the augmented
    width is exactly 128 lanes, so the fold is FREE (the un-augmented matmul
    would pad 64->128 lanes anyway) and the VPU row-sum pass disappears.
    Measured ds1 (B16 N4096 H5x64): 3.60ms/95.6T vs 3.90ms/88.1T for the
    plain packed kernel (exact softmax)."""
    for h in range(heads):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        q = (q_ref[0][:, sl].astype(jnp.float32) * scale).astype(q_ref.dtype)
        k = k_ref[0][:, sl]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        if exact:
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
        else:
            p = jnp.exp(s - _FAST_SHIFT)
        va = va_ref[0][:, h * 2 * head_dim: (h + 1) * 2 * head_dim]
        acc = jax.lax.dot_general(
            p.astype(va.dtype), va, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)       # (bq, 2d): [p@v | l]
        l = acc[:, head_dim: head_dim + 1]
        o_ref[0, :, sl] = (acc[:, :head_dim] / l).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("scale", "heads", "block_q", "exact", "interpret"),
)
def flash_attention_packed_ones(
    q: jnp.ndarray,  # (B, Nq, C)
    k: jnp.ndarray,  # (B, Nk, C)
    v: jnp.ndarray,
    scale: float,
    heads: int,
    block_q: int = 256,
    exact: bool = True,
    interpret: bool = False,
) -> jnp.ndarray:
    """flash_attention_packed with the ones-column row-sum fold (see kernel)."""
    b, nq, c = q.shape
    nk = k.shape[1]
    d = c // heads
    vh = v.reshape(b, nk, heads, d)
    ones = jnp.ones((b, nk, heads, 1), v.dtype)
    zeros = jnp.zeros((b, nk, heads, d - 1), v.dtype)
    va = jnp.concatenate([vh, ones, zeros], axis=-1).reshape(b, nk, heads * 2 * d)
    qb = min(block_q, nq)
    pad = (-nq) % qb
    if pad:
        q = jnp.pad(q, ((0, 0), (0, pad), (0, 0)))
    grid = (b, pl.cdiv(nq + pad, qb))
    kernel = functools.partial(_packed_ones_kernel, scale=scale, exact=exact,
                               heads=heads, head_dim=d)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, qb, c), lambda b_, i: (b_, i, 0)),
            pl.BlockSpec((1, nk, c), lambda b_, i: (b_, 0, 0)),
            pl.BlockSpec((1, nk, 2 * c), lambda b_, i: (b_, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, qb, c), lambda b_, i: (b_, i, 0)),
        out_shape=jax.ShapeDtypeStruct((b, nq + pad, c), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * heads * nq * nk * d,
            bytes_accessed=2 * b * (nq + 3 * nk) * c,
            transcendentals=b * heads * nq * nk,
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(q, k, va)
    return out[:, :nq]


def _packed_fold_kernel(q_ref, k_ref, v_ref, o_ref, va_ref, *, scale: float,
                        exact: bool, heads: int, head_dim: int):
    """Heads-packed kernel with the softmax row-sum folded into PV — built
    IN-KERNEL, so the host-side V-augment concat (which measurably regressed
    e2e) never exists.

    The row-sum over the key axis is a LANE reduction: measured 1.35 ms per
    ds1 site (26% of the op) vs the QK matmul's 2.06 ms — the single largest
    non-MXU cost. PV's N=64 output occupies half a 128-lane MXU tile anyway,
    so an augmented V' = [v_h | 1 | 0...] per head makes the same matmul
    return [p@v | sum(p)] for free. V' lives in VMEM scratch, built once per
    batch (grid iterates q-tiles innermost; pl.when(i==0) guards the build)
    and reused by all q tiles.

    d=64 only (2*d must tile 128 lanes); callers fall back to _packed_kernel
    otherwise."""
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _build_va():
        for h in range(heads):
            v = v_ref[0][:, h * head_dim:(h + 1) * head_dim]
            va_ref[:, 2 * h * head_dim: (2 * h + 1) * head_dim] = v
            ones = jnp.ones((v.shape[0], 1), v.dtype)
            zeros = jnp.zeros((v.shape[0], head_dim - 1), v.dtype)
            va_ref[:, (2 * h + 1) * head_dim: (2 * h + 2) * head_dim] = (
                jnp.concatenate([ones, zeros], axis=-1))

    for h in range(heads):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        q = (q_ref[0][:, sl].astype(jnp.float32) * scale).astype(q_ref.dtype)
        k = k_ref[0][:, sl]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        if exact:
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
        else:
            # same static shift as every other exact=False variant: raw exp
            # overflows fp32 at logit ~88, the shift extends headroom to ~108
            # (measured a tie vs raw exp — ROADMAP "no-shift exp")
            p = jnp.exp(s - _FAST_SHIFT)
        va = va_ref[:, 2 * h * head_dim: 2 * (h + 1) * head_dim]
        acc = jax.lax.dot_general(
            p.astype(va.dtype), va, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)       # (bq, 2d) = [p@v | l ..]
        l = acc[:, head_dim: head_dim + 1]
        o_ref[0, :, sl] = (acc[:, :head_dim] / l).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("scale", "heads", "block_q", "exact", "interpret"),
)
def flash_attention_packed_fold(
    q: jnp.ndarray,  # (B, Nq, C)
    k: jnp.ndarray,  # (B, Nk, C)
    v: jnp.ndarray,
    scale: float,
    heads: int,
    block_q: int = 256,
    exact: bool = True,
    interpret: bool = False,
) -> jnp.ndarray:
    """flash_attention_packed with the in-kernel scratch ones-fold (d=64)."""
    b, nq, c = q.shape
    nk = k.shape[1]
    d = c // heads
    assert d == 64, "fold path requires head_dim 64"
    qb = min(block_q, nq)
    pad = (-nq) % qb
    if pad:
        q = jnp.pad(q, ((0, 0), (0, pad), (0, 0)))
    grid = (b, pl.cdiv(nq + pad, qb))
    kernel = functools.partial(_packed_fold_kernel, scale=scale, exact=exact,
                               heads=heads, head_dim=d)
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
        scratch_shapes=[pltpu.VMEM((nk, 2 * c), v.dtype)],
        cost_estimate=pl.CostEstimate(
            flops=4 * b * heads * nq * nk * d,
            bytes_accessed=2 * b * (nq + 2 * nk) * c,
            transcendentals=b * heads * nq * nk,
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(q, k, v)
    return out[:, :nq]


def _packed_proj_kernel(xq_ref, xkv_ref, wq_ref, wk_ref, wv_ref, wo_ref,
                        bo_ref, o_ref, ks_ref, vs_ref, *, exact: bool,
                        heads: int, head_dim: int):
    """Fully-fused self-attention block: q/k/v projections + packed
    multi-head attention + output projection in ONE kernel.

    The q/k/v/out projection round-trips (3 GEMM writes + reads of (B,N,C)
    each, plus the attention output write + out-proj read) are ~370 MB of
    HBM traffic per ds1 site that this kernel never performs: K'=x@Wk and
    V'=x@Wv are built once per batch into VMEM scratch (grid iterates q
    tiles innermost), q projects per-tile, and the out projection runs on
    the VMEM attention output before the single HBM write. The softmax
    scale is pre-folded into Wq by the wrapper.

    xq_ref: (1, bq, C) q-tile slice of x;  xkv_ref: (1, N, C) full-N slice
    (same array, second BlockSpec);  w*_ref: (C, C);  bo_ref: (1, C)
    ks/vs scratch: (N, C) in x.dtype.
    """
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _build_kv():
        xkv = xkv_ref[0]
        ks_ref[:] = jax.lax.dot_general(
            xkv, wk_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(ks_ref.dtype)
        vs_ref[:] = jax.lax.dot_general(
            xkv, wv_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(vs_ref.dtype)

    q = jax.lax.dot_general(
        xq_ref[0], wq_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(xq_ref.dtype)  # (bq, C)

    outs = []
    for h in range(heads):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        s = jax.lax.dot_general(
            q[:, sl], ks_ref[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        if exact:
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
        else:
            p = jnp.exp(s)
        l = jnp.sum(p, axis=-1, keepdims=True)
        acc = jax.lax.dot_general(
            p.astype(vs_ref.dtype), vs_ref[:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        outs.append((acc / l).astype(xq_ref.dtype))
    o = jnp.concatenate(outs, axis=-1)                            # (bq, C)
    y = jax.lax.dot_general(
        o, wo_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + bo_ref[0].astype(jnp.float32)
    o_ref[0] = y.astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("scale", "heads", "block_q", "exact", "interpret"),
)
def flash_attention_packed_proj(
    x: jnp.ndarray,   # (B, N, C) pre-LN'd tokens (self-attention input)
    wq: jnp.ndarray,  # (C, C)
    wk: jnp.ndarray,
    wv: jnp.ndarray,
    wo: jnp.ndarray,
    bo: jnp.ndarray,  # (C,)
    scale: float,
    heads: int,
    block_q: int = 256,
    exact: bool = True,
    interpret: bool = False,
) -> jnp.ndarray:
    """to_out(attention(x@Wq, x@Wk, x@Wv)) as one fused kernel (see
    _packed_proj_kernel). Requires N % block_q == 0 (spatial tokens)."""
    b, n, c = x.shape
    qb = min(block_q, n)
    assert n % qb == 0, (n, qb)
    dtype = x.dtype
    wqs = (wq.astype(jnp.float32) * scale).astype(dtype)
    wk = wk.astype(dtype)
    wv = wv.astype(dtype)
    wo = wo.astype(dtype)
    grid = (b, n // qb)
    kernel = functools.partial(_packed_proj_kernel, exact=exact, heads=heads,
                               head_dim=c // heads)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, qb, c), lambda b_, i: (b_, i, 0)),
            pl.BlockSpec((1, n, c), lambda b_, i: (b_, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, qb, c), lambda b_, i: (b_, i, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n, c), dtype),
        scratch_shapes=[
            pltpu.VMEM((n, c), dtype),
            pltpu.VMEM((n, c), dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * b * n * n * (c // heads) * heads + 8 * b * n * c * c,
            bytes_accessed=2 * b * n * c * 3,
            transcendentals=b * heads * n * n,
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=80 * 1024 * 1024),
        interpret=interpret,
    )(x, x, wqs, wk, wv, wo, bo.reshape(1, c).astype(jnp.float32))




def _packed_out_kernel(q_ref, k_ref, v_ref, wo_ref, bo_ref, o_ref, *,
                       scale: float, exact: bool, heads: int, head_dim: int):
    """_packed_kernel + the to_out projection fused into the epilogue.

    Per head: softmax(q_h k_h^T) v_h as usual, then the head's (bq, d) output
    immediately contracts with its W_o row-block (d, C) and accumulates into
    one fp32 (bq, C) tile — the attention output never round-trips HBM, and
    the {2,0,1}<->{2,1,0} relayout copies XLA inserts between the attention
    custom-call and the conv-emitted to_out dot disappear. Unlike the full
    fused-proj kernel (q/k/v GEMMs in-kernel, measured e2e REGRESSION from
    serialized K/V projections at grid step 0), the q/k/v projections stay
    with XLA."""
    acc = None
    for h in range(heads):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        q = (q_ref[0][:, sl].astype(jnp.float32) * scale).astype(q_ref.dtype)
        k = k_ref[0][:, sl]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        if exact:
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
        else:
            p = jnp.exp(s)
        l = jnp.sum(p, axis=-1, keepdims=True)
        v = v_ref[0][:, sl]
        o_h = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) / l
        contrib = jax.lax.dot_general(
            o_h.astype(v.dtype), wo_ref[sl, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc = contrib if acc is None else acc + contrib
    o_ref[0] = (acc + bo_ref[...]).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("scale", "heads", "block_q", "exact", "interpret"),
)
def flash_attention_packed_out(
    q: jnp.ndarray,   # (B, Nq, C)
    k: jnp.ndarray,   # (B, Nk, C)
    v: jnp.ndarray,
    wo: jnp.ndarray,  # (C, C_out)
    bo: jnp.ndarray,  # (C_out,)
    scale: float,
    heads: int,
    block_q: int = 256,
    exact: bool = True,
    interpret: bool = False,
) -> jnp.ndarray:
    """attention(q, k, v) @ W_o + b_o with the projection fused in-kernel."""
    b, nq, c = q.shape
    nk = k.shape[1]
    c_out = wo.shape[-1]
    d = c // heads
    qb = min(block_q, nq)
    pad = (-nq) % qb
    if pad:
        q = jnp.pad(q, ((0, 0), (0, pad), (0, 0)))
    grid = (b, pl.cdiv(nq + pad, qb))
    kernel = functools.partial(_packed_out_kernel, scale=scale, exact=exact,
                               heads=heads, head_dim=d)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, qb, c), lambda b_, i: (b_, i, 0)),
            pl.BlockSpec((1, nk, c), lambda b_, i: (b_, 0, 0)),
            pl.BlockSpec((1, nk, c), lambda b_, i: (b_, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # wo, grid-resident
            pl.BlockSpec(memory_space=pltpu.VMEM),  # bo
        ],
        out_specs=pl.BlockSpec((1, qb, c_out), lambda b_, i: (b_, i, 0)),
        out_shape=jax.ShapeDtypeStruct((b, nq + pad, c_out), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * heads * nq * nk * d + 2 * b * nq * c * c_out,
            bytes_accessed=2 * b * (nq + 2 * nk) * c + 2 * c * c_out,
            transcendentals=b * heads * nq * nk,
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(q, k, v, wo.astype(q.dtype), bo.reshape(1, c_out).astype(jnp.float32))
    return out[:, :nq]
