"""STATUS: REJECTED for SD2 shipping (e2e-neutral; kept for the record and
for larger-width configs where weight VMEM residency may pay off).

Measured (ROADMAP): standalone ds1 site 2.698 ms vs 3.496 XLA-standalone, but
e2e NEUTRAL (1.904 vs 1.906 img/s) — in-program XLA runs the FF at ~1.1
ms/site by fusing LN/gelu into neighboring chains. Moved out of ops/ in the
r4 flag hygiene (was MDT_FUSE_FF).

Fused LayerNorm -> GEGLU feed-forward -> residual, one Pallas TPU kernel.

Why: the transformer FF is the UNet's largest HBM-traffic site. XLA executes
LN / x@W1 / split-GEGLU / u@W2 / +residual as five kernels, materializing the
(B, N, 8C) GEGLU intermediate in HBM both directions — ~1.3 GB per ds1 block
at SD2 512² CFG-batch 16, ~11 GB per UNet step across all 16 transformer
blocks (measured via compiled cost analysis: 37.9 GB/step total). This kernel
keeps the whole chain in VMEM: HBM traffic drops to read-x + write-y, and both
matmuls ride the MXU back-to-back on resident weights.

Math parity (reference attention.py:60-74 FeedForward/GEGLU, norms at
attention.py:256): y = x + (a * gelu(g)) @ W2 + b2 where [a; g] = LN(x) @ W1
+ b1, LN statistics in fp32, gelu tanh-approximate, matmuls bf16 with fp32
accumulation — identical to the unfused flax path (its parity tests, retired with the flag).

Layout: x (B, N, C) tokens; W1 (C, 8C') packed [a-half | gate-half] on the
output axis; W2 (4C', C). Row tiles of x stream through the grid; weights are
grid-constant (DMA'd once, resident across steps). All lane dims are
128-friendly at SD widths (C in {320, 640, 1280}, halves 4C in
{1280, 2560, 5120}).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ff_reference(x, ln_scale, ln_bias, w1, b1, w2, b2, eps):
    """Unfused composition (same math): used on CPU and as the test oracle."""
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mu = x32.mean(axis=-1, keepdims=True)
    var = (x32 * x32).mean(axis=-1, keepdims=True) - mu * mu
    h = (x32 - mu) * jax.lax.rsqrt(var + eps)
    h = h * ln_scale.astype(jnp.float32) + ln_bias.astype(jnp.float32)
    g = jnp.dot(h.astype(dtype), w1.astype(dtype),
                preferred_element_type=jnp.float32) + b1.astype(jnp.float32)
    half = g.shape[-1] // 2
    u = g[..., :half] * jax.nn.gelu(g[..., half:], approximate=True)
    y = jnp.dot(u.astype(dtype), w2.astype(dtype),
                preferred_element_type=jnp.float32) + b2.astype(jnp.float32)
    return (x32 + y).astype(dtype)


def _ff_kernel(x_ref, s_ref, t_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref, *,
               eps: float, subtiles: int = 1):
    """subtiles > 1 splits the row block into independent LN->MXU->gelu->MXU
    chains so Mosaic's scheduler can overlap sub-chain i's VPU gelu with
    sub-chain i+1's MXU matmul (the serialized VPU prologue/gelu is why the
    single-chain kernel loses to XLA's pipelined fusions e2e)."""
    for i in range(subtiles):
        rows = pl.ds(i * (x_ref.shape[1] // subtiles),
                     x_ref.shape[1] // subtiles)
        x = x_ref[0, rows]                        # (bn/S, C) input dtype
        x32 = x.astype(jnp.float32)
        mu = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.mean(x32 * x32, axis=-1, keepdims=True) - mu * mu
        h = (x32 - mu) * jax.lax.rsqrt(var + eps)
        h = h * s_ref[0].astype(jnp.float32) + t_ref[0].astype(jnp.float32)
        g = jax.lax.dot_general(
            h.astype(x.dtype), w1_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b1_ref[0].astype(jnp.float32)         # (bn/S, 8C')
        half = g.shape[-1] // 2
        u = g[:, :half] * jax.nn.gelu(g[:, half:], approximate=True)
        y = jax.lax.dot_general(
            u.astype(x.dtype), w2_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b2_ref[0].astype(jnp.float32)
        o_ref[0, rows] = (x32 + y).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("eps", "block_rows", "interpret", "force_pallas",
                              "subtiles"))
def fused_ln_geglu_ff(
    x: jnp.ndarray,         # (B, N, C)
    ln_scale: jnp.ndarray,  # (C,)
    ln_bias: jnp.ndarray,   # (C,)
    w1: jnp.ndarray,        # (C, 2F)  [value-half | gate-half]
    b1: jnp.ndarray,        # (2F,)
    w2: jnp.ndarray,        # (F, C)
    b2: jnp.ndarray,        # (C,)
    eps: float = 1e-5,
    block_rows: int = 256,
    interpret: bool = False,
    force_pallas: bool = False,
    subtiles: int = 1,
) -> jnp.ndarray:
    """y = x + FF_geglu(LN(x)); one kernel on TPU, jnp composition elsewhere."""
    if not (force_pallas or jax.default_backend() == "tpu"):
        return _ff_reference(x, ln_scale, ln_bias, w1, b1, w2, b2, eps)

    b, n, c = x.shape
    f2 = w1.shape[1]
    dtype = x.dtype
    itemsize = jnp.dtype(dtype).itemsize

    bn = min(block_rows, n)
    # VMEM budget: weights resident + fp32 g tile dominate
    def footprint(bn_):
        return (w1.size + w2.size) * itemsize + bn_ * f2 * 4 + 6 * bn_ * c * 4
    while footprint(bn) > 56 * 1024 * 1024 and bn > 64:
        bn //= 2
    pad = (-n) % bn
    xp = jnp.pad(x, ((0, 0), (0, pad), (0, 0))) if pad else x
    grid = (b, (n + pad) // bn)
    # the kernel's subtile loop covers exactly bn rows only when subtiles
    # divides bn — otherwise the remainder rows would never be written
    # (uninitialized VMEM in the output). Degrade to the largest divisor.
    while subtiles > 1 and bn % subtiles:
        subtiles -= 1

    out = pl.pallas_call(
        functools.partial(_ff_kernel, eps=eps, subtiles=subtiles),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bn, c), lambda bi, i: (bi, i, 0)),
            pl.BlockSpec((1, c), lambda bi, i: (0, 0)),
            pl.BlockSpec((1, c), lambda bi, i: (0, 0)),
            pl.BlockSpec((c, f2), lambda bi, i: (0, 0)),
            pl.BlockSpec((1, f2), lambda bi, i: (0, 0)),
            pl.BlockSpec((f2 // 2, c), lambda bi, i: (0, 0)),
            pl.BlockSpec((1, c), lambda bi, i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bn, c), lambda bi, i: (bi, i, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n + pad, c), dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * (c * f2 + f2 // 2 * c),
            bytes_accessed=2 * b * n * c * itemsize + (w1.size + w2.size) * itemsize,
            transcendentals=b * n * f2 // 2,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=interpret,
    )(
        xp,
        ln_scale.astype(dtype).reshape(1, c),
        ln_bias.astype(dtype).reshape(1, c),
        w1.astype(dtype),
        b1.astype(dtype).reshape(1, f2),
        w2.astype(dtype),
        b2.astype(dtype).reshape(1, c),
    )
    return out[:, :n] if pad else out
