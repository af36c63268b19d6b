"""Pallas TPU 3x3 same-padding conv (stride 1) — implicit GEMM.

STATUS: measured LOSING experiment, superseded by ops/winograd.py (which now
also does kernel-side halo DMA — the "does not compile" note below predates
the 8-aligned-slice fix in _wino_kernel_dma). Round-1 microbenches over the
tunnel carried a ~2 ms/call dispatch bias that made XLA's conv look like
53-61 TFLOP/s; corrected scan-amortized truth is 111-190 TFLOP/s at SD
shapes, which neither kernel here approaches. Kept (with its bench harness,
benchmarks/bench_conv.py) as the record of the implicit-GEMM design space.

The kernel expresses the conv as 9 shifted (rows, W, C_in) @
(C_in, C_out) MXU matmuls accumulating in fp32. Standard BlockSpecs only
describe disjoint blocks, so the row halo is materialized host-side: a
gather builds overlapping row tiles (B, n_tiles, bh+2, W+2, C) — 2/bh extra
HBM traffic (6% at the default bh=32), far cheaper than im2col's 9x patches.
The 9 shifted windows are then plain slices of the VMEM-resident tile.

Layout contract matches flax nn.Conv: x (B, H, W, C_in) NHWC, kernel
(3, 3, C_in, C_out) HWIO, bias (C_out,). fp32 accumulation, output in the
input dtype.

Two kernels live here:

* `conv3x3_pallas` (v1, round 1) — 9 shifted-window matmuls. The 6 dx-shifted
  windows trigger a sublane relayout before every MXU op: measured 44.7 T at
  64x64x320 / 57.9 T at 32x32x640 vs XLA's 53.6 / 59.5 on v5e. Kept as a
  baseline for the bench harness.
* `conv3x3_gemm` (v2, round 2) — relayout-free formulation. The 3 dy taps are
  stacked along the LANE axis at 128-aligned offsets (K = 3 * ceil128(C_in)),
  so the 3 remaining matmuls (one per dx) see perfectly aligned operands; the
  dx offset is resolved AFTER the matmul by two shifted fp32 accumulator adds
  (cheap VPU rotates of the output instead of six bf16 input relayouts).
  Optionally fuses the ResBlock's GroupNorm-affine + SiLU prologue and the
  bias + residual epilogue so the activation never round-trips HBM between
  the norm and the conv.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, w_ref, b_ref, o_ref, *, bh: int, width: int):
    x_tile = x_ref[0, 0]  # (bh+2, W+2, C_in)
    # NOTE: hoisting the dx shifts into 3 pre-shifted copies was measured
    # SLOWER (42.7 vs 44.7 T) — Mosaic materializes the copies fully while
    # the in-loop slices partially fold into the matmul operands
    acc = None
    for dy in range(3):
        for dx in range(3):
            window = x_tile[dy:dy + bh, dx:dx + width, :]
            part = jax.lax.dot_general(
                window, w_ref[dy, dx], (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (bh, W, C_out)
            acc = part if acc is None else acc + part
    acc = acc + b_ref[:].astype(jnp.float32)
    o_ref[0] = acc.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_rows", "interpret"))
def conv3x3_pallas(
    x: jnp.ndarray,       # (B, H, W, C_in)
    kernel: jnp.ndarray,  # (3, 3, C_in, C_out)
    bias: Optional[jnp.ndarray] = None,
    block_rows: int = 32,
    interpret: bool = False,
) -> jnp.ndarray:
    b, h, w, c_in = x.shape
    c_out = kernel.shape[-1]
    if bias is None:
        bias = jnp.zeros((c_out,), jnp.float32)

    bh = min(block_rows, h)
    pad_h = (-h) % bh
    xp = jnp.pad(x, ((0, 0), (1, 1 + pad_h), (1, 1), (0, 0)))
    hp = h + pad_h
    n_tiles = hp // bh
    # overlapping row tiles: rows[i] = i*bh .. i*bh + bh+2
    row_idx = (jnp.arange(n_tiles)[:, None] * bh
               + jnp.arange(bh + 2)[None, :])          # (n_tiles, bh+2)
    x_tiles = xp[:, row_idx]                            # (B, n_tiles, bh+2, W+2, C)
    kern = kernel.astype(x.dtype)

    out = pl.pallas_call(
        functools.partial(_kernel, bh=bh, width=w),
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec((1, 1, bh + 2, w + 2, c_in),
                         lambda bi, i: (bi, i, 0, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bh, w, c_out), lambda bi, i: (bi, i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, hp, w, c_out), x.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(x_tiles, kern, bias)
    return out[:, :h]


# ---------------------------------------------------------------------------
# v2: relayout-free implicit GEMM (dy taps in K, dx on the output side)
# ---------------------------------------------------------------------------


def _round_up(n: int, m: int) -> int:
    return (n + m - 1) // m * m


def _gemm_kernel(*refs, bh: int, width: int, height: int, c_in: int, cp: int,
                 silu_prologue: bool, has_affine: bool, has_residual: bool):
    """One (batch, row-tile, cout-block) grid step.

    Operand order: x_tile [, scale, shift], w, bias [, residual], out, r_scratch.
    r_ref scratch (bh, W+2, 3*cp) holds the dy-stacked rows: lanes
    [tap*cp, tap*cp+c_in) = x_tile[tap : tap+bh]. All three matmuls contract
    the full lane axis with aligned operands; dx is applied as two shifted
    fp32 adds on the (bh, W+2, bn) results.
    """
    it = iter(refs)
    x_ref = next(it)
    scale_ref = next(it) if has_affine else None
    shift_ref = next(it) if has_affine else None
    w_ref = next(it)
    b_ref = next(it)
    res_ref = next(it) if has_residual else None
    o_ref = next(it)
    r_ref = next(it)

    co_id = pl.program_id(2)
    row0 = pl.program_id(1) * bh  # hoisted: program_id must sit at the top
    # level of the kernel jaxpr (interpret lowering can't see it under when)

    @pl.when(co_id == 0)
    def build_r():
        x_tile = x_ref[0, 0]  # (bh+2, W+2, C_in)
        if has_affine:
            scale = scale_ref[0, 0].astype(jnp.float32)  # (C_in,) per-sample
            shift = shift_ref[0, 0].astype(jnp.float32)
            x_tile = x_tile.astype(jnp.float32) * scale + shift
        if silu_prologue:
            x_tile = x_tile.astype(jnp.float32)
            x_tile = jax.nn.sigmoid(x_tile) * x_tile
        if has_affine or silu_prologue:
            # the zero-padding halo must stay zero THROUGH the prologue
            # (silu(0*a + b) != 0): mask padded rows/cols back to zero
            rows = jax.lax.broadcasted_iota(
                jnp.int32, (x_tile.shape[0], x_tile.shape[1], 1), 0) + row0
            cols = jax.lax.broadcasted_iota(
                jnp.int32, (x_tile.shape[0], x_tile.shape[1], 1), 1)
            valid = ((rows >= 1) & (rows <= height)
                     & (cols >= 1) & (cols <= width))
            x_tile = jnp.where(valid, x_tile, 0.0)
        x_tile = x_tile.astype(r_ref.dtype)
        for tap in range(3):
            r_ref[:, :, tap * cp: tap * cp + c_in] = x_tile[tap: tap + bh]
            if c_in != cp:
                r_ref[:, :, tap * cp + c_in: (tap + 1) * cp] = jnp.zeros(
                    (bh, r_ref.shape[1], cp - c_in), r_ref.dtype)

    r = r_ref[:]
    dims = (((2,), (0,)), ((), ()))
    acc = jax.lax.dot_general(
        r, w_ref[0], dims, preferred_element_type=jnp.float32)[:, 0:width]
    acc += jax.lax.dot_general(
        r, w_ref[1], dims, preferred_element_type=jnp.float32)[:, 1:width + 1]
    acc += jax.lax.dot_general(
        r, w_ref[2], dims, preferred_element_type=jnp.float32)[:, 2:width + 2]
    acc += b_ref[0].astype(jnp.float32)
    if has_residual:
        acc += res_ref[0].astype(jnp.float32)
    o_ref[0] = acc.astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("silu_prologue", "block_rows", "block_cout", "out_dtype",
                     "interpret"),
)
def conv3x3_gemm(
    x: jnp.ndarray,        # (B, H, W, C_in)
    kernel: jnp.ndarray,   # (3, 3, C_in, C_out)
    bias: Optional[jnp.ndarray] = None,       # (C_out,)
    *,
    prologue_scale: Optional[jnp.ndarray] = None,  # (B, C_in): GN-affine fold
    prologue_shift: Optional[jnp.ndarray] = None,  # (B, C_in)
    silu_prologue: bool = False,
    residual: Optional[jnp.ndarray] = None,   # (B, H, W, C_out) added to out
    block_rows: int = 32,
    block_cout: int = 0,   # 0 = auto from the VMEM budget
    out_dtype=None,
    interpret: bool = False,
) -> jnp.ndarray:
    """3x3 stride-1 same-pad conv, relayout-free implicit GEMM (see module doc).

    Optional fusions (all applied inside the kernel, saving HBM round-trips):
      y = conv(silu(x * scale + shift)) + bias + residual
    where (scale, shift) is the per-sample GroupNorm affine fold
    (a = gamma*rsqrt(var+eps), b = beta - mean*a) computed host-side from the
    GN statistics — the stats reduction stays in XLA, the normalize/SiLU
    never materializes in HBM.
    """
    b, h, w, c_in = x.shape
    c_out = kernel.shape[-1]
    dtype = x.dtype
    if out_dtype is None:
        out_dtype = dtype
    if bias is None:
        bias = jnp.zeros((c_out,), jnp.float32)

    has_affine = prologue_scale is not None
    has_residual = residual is not None

    cp = _round_up(c_in, 128)
    bh = min(block_rows, h)
    pad_h = (-h) % bh
    hp = h + pad_h
    n_tiles = hp // bh

    # auto C_out block: budget VMEM (w block double-buffered + r scratch +
    # x tile + fp32 accumulator)
    bn = block_cout or c_out
    itemsize = jnp.dtype(dtype).itemsize

    def footprint(bn_):
        w_blk = 2 * 3 * 3 * cp * bn_ * itemsize          # double-buffered
        r_scr = bh * (w + 2) * 3 * cp * itemsize
        x_blk = 2 * (bh + 2) * (w + 2) * c_in * itemsize
        acc = 2 * bh * (w + 2) * bn_ * 4
        out_blk = 2 * bh * w * bn_ * jnp.dtype(out_dtype).itemsize
        res_blk = 2 * bh * w * bn_ * itemsize if has_residual else 0
        return w_blk + r_scr + x_blk + acc + out_blk + res_blk

    budget = 24 * 1024 * 1024
    if block_cout == 0:
        # Mosaic requires the lane (last) block dim to be a multiple of 128 or
        # equal to the full array dim: candidates are c_out itself plus every
        # 128-multiple divisor, largest-first.
        cands = [c_out] + [m for m in range(c_out - 128, 0, -128)
                           if m % 128 == 0 and c_out % m == 0]
        bn = next((c for c in cands if footprint(c) <= budget), cands[-1])
    n_co = c_out // bn if c_out % bn == 0 else 1
    if c_out % bn:
        bn = c_out

    xp = jnp.pad(x, ((0, 0), (1, 1 + pad_h), (1, 1), (0, 0)))
    row_idx = (jnp.arange(n_tiles)[:, None] * bh
               + jnp.arange(bh + 2)[None, :])            # (n_tiles, bh+2)
    x_tiles = xp[:, row_idx]                             # (B, n_tiles, bh+2, W+2, C)

    # weights: (3_dx, 3*cp, C_out); w2[dx, tap*cp + ci, co] = kernel[tap, dx]
    kern = kernel.astype(dtype)
    if cp != c_in:
        kern = jnp.pad(kern, ((0, 0), (0, 0), (0, cp - c_in), (0, 0)))
    w2 = kern.transpose(1, 0, 2, 3).reshape(3, 3 * cp, c_out)

    grid = (b, n_tiles, n_co)
    in_specs = [
        pl.BlockSpec((1, 1, bh + 2, w + 2, c_in), lambda bi, i, ci: (bi, i, 0, 0, 0)),
    ]
    operands = [x_tiles]
    if has_affine:
        in_specs += [
            pl.BlockSpec((1, 1, c_in), lambda bi, i, ci: (bi, 0, 0)),
            pl.BlockSpec((1, 1, c_in), lambda bi, i, ci: (bi, 0, 0)),
        ]
        operands += [prologue_scale[:, None, :], prologue_shift[:, None, :]]
    in_specs += [
        pl.BlockSpec((3, 3 * cp, bn), lambda bi, i, ci: (0, 0, ci)),
        pl.BlockSpec((1, bn), lambda bi, i, ci: (0, ci)),
    ]
    operands += [w2, bias.reshape(1, c_out)]
    if has_residual:
        rp = residual if pad_h == 0 else jnp.pad(
            residual, ((0, 0), (0, pad_h), (0, 0), (0, 0)))
        in_specs.append(
            pl.BlockSpec((1, bh, w, bn), lambda bi, i, ci: (bi, i, 0, ci)))
        operands.append(rp)

    out = pl.pallas_call(
        functools.partial(
            _gemm_kernel, bh=bh, width=w, height=h, c_in=c_in, cp=cp,
            silu_prologue=silu_prologue, has_affine=has_affine,
            has_residual=has_residual),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, bh, w, bn), lambda bi, i, ci: (bi, i, 0, ci)),
        out_shape=jax.ShapeDtypeStruct((b, hp, w, c_out), out_dtype),
        scratch_shapes=[pltpu.VMEM((bh, w + 2, 3 * cp), dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(*operands)
    return out[:, :h]


def groupnorm_affine_fold(
    x: jnp.ndarray, gamma: jnp.ndarray, beta: jnp.ndarray,
    num_groups: int = 32, eps: float = 1e-5,
):
    """Per-sample (scale, shift) folding GroupNorm stats into one affine.

    Returns (a, b) of shape (B, C) with normalize(x)*gamma+beta == x*a + b.
    The reduction is left to XLA (it fuses into neighbors); the elementwise
    normalize is applied inside conv3x3_gemm's prologue.
    """
    b, h, w, c = x.shape
    groups = num_groups
    while c % groups:
        groups -= 1
    xg = x.astype(jnp.float32).reshape(b, h * w, groups, c // groups)
    mean = xg.mean(axis=(1, 3))                       # (B, G)
    var = xg.var(axis=(1, 3))                         # (B, G)
    inv = jax.lax.rsqrt(var + eps)
    inv = jnp.repeat(inv, c // groups, axis=1)        # (B, C)
    mean = jnp.repeat(mean, c // groups, axis=1)
    a = gamma[None, :].astype(jnp.float32) * inv
    bshift = beta[None, :].astype(jnp.float32) - mean * a
    return a, bshift
