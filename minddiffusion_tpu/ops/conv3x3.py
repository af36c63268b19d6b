"""Pallas TPU 3x3 same-padding conv (stride 1) — implicit GEMM.

XLA:TPU's conv at SD's resblock shapes measures ~30% of peak (53-61 TFLOP/s,
see ROADMAP.md); this kernel expresses the conv as 9 shifted (rows, W, C_in) @
(C_in, C_out) MXU matmuls accumulating in fp32. Standard BlockSpecs only
describe disjoint blocks, and kernel-side halo DMA does not compile in this
environment, so the row halo is materialized host-side: a gather builds
overlapping row tiles (B, n_tiles, bh+2, W+2, C) — 2/bh extra HBM traffic
(6% at the default bh=32), far cheaper than im2col's 9x patches. The 9
shifted windows are then plain slices of the VMEM-resident tile.

Layout contract matches flax nn.Conv: x (B, H, W, C_in) NHWC, kernel
(3, 3, C_in, C_out) HWIO, bias (C_out,). fp32 accumulation, output in the
input dtype.

STATUS — experimental, NOT wired into the models: measured on v5e (B16,
bf16, scan-amortized) it reaches 44.7 T at 64x64x320 / 57.9 T at 32x32x640
vs XLA's 53.6 / 59.5 — the dx-shifted windows trigger a sublane relayout
before every MXU op, eating the theoretical win. Round-2 path: keep the
input tile in a (W+2)-major layout so the 9 shifts are lane-aligned, or
pre-shift once into 3 dx-variants per tile (3 relayouts instead of 9).
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
