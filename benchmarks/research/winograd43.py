"""Winograd F(4x4, 3x3) convolution — Pallas TPU kernel (VAE-decoder shapes).

F(2x2,3x3) (ops/winograd.py) cuts 3x3-conv MACs 2.25x; F(4x4,3x3) cuts them
4x: 36 MACs per 4x4-pixel tile = 2.25 per pixel vs 9 direct. The VAE decoder
was the target: XLA's direct conv already runs at 186-193 TFLOP/s there
(compute-bound AT the bf16 peak), so only a FLOP reduction can make decode
faster — and the decoder's channel widths (512/256/128) are all lane-aligned,
so the inner matmuls don't pay the 320-channel padding tax the UNet does.

STATUS — measured NEGATIVE on v5e, not wired into any model. Scan-timed b8:
128x128x512->512: 6.67 ms vs XLA 6.73 (tie); 256x256x256: 9.52 vs 7.51
(LOSES); 512x512x128: 14.78 vs 8.31 (LOSES 1.8x); 256x256x512->256: 13.05 vs
12.15. The 2.25x-data fp32 transforms are VPU-bandwidth-bound at large
spatial extents and swamp the MXU savings — the same failure mode that keeps
F(2,3) off the 64x64 UNet level, amplified by the 6-slot combos. bf16 error
is also ~15x F(2,3)'s (relerr ~6e-2 vs 4e-3; A^T/B^T constants up to 8).
Kept as a parity-tested record of WHY the VAE stays on XLA's direct conv;
`wino43_wins` is referenced by no model path.

UNet small-spatial shapes also measured (benchmarks/bench_wino43_unet.py,
b16 scan-timed): 32²x640->640 = 2.116 ms vs F(2,3) 1.965 vs XLA 2.172 —
F43 loses to F22 even at its best-fit UNet site (the 36 per-tile matmuls are
M-skinny at small spatial: M = bh/4 * W/4 rows with no batch merging). The
1280-wide ds3 sites are unreachable outright: U43 = 36*1280*1280*2B = 118 MB
exceeds VMEM (would need combo-streamed U). F43 stays out of the UNet too.

Structure mirrors ops/winograd.py's DMA path: lane-merge groups of FOUR
columns into 4*cp lanes on the host (one retiling pass), the kernel fetches
its own overlapping (bh+4)-row halo windows via double-buffered async copies,
applies B^T on columns (6 combos) and rows (6 combos) as VPU adds, runs the
36 MXU matmuls against grid-resident U = G k G^T, and applies A^T twice for
the 4x4 outputs, kept column-merged (host un-merges with a free reshape).

Numerics: transforms in fp32 (B^T/A^T constants up to 8; G down to 1/24),
matmuls bf16 with fp32 accumulation. Error vs the fp32 direct conv is ~2-3x
F(2,3)'s (larger transform dynamic range) — well inside bf16 inference noise
(tests/test_winograd43.py).

B^T = [[4,0,-5,0,1,0], [0,-4,-4,1,1,0], [0,4,-4,-1,1,0],
       [0,-2,-1,2,1,0], [0,2,-1,-2,1,0], [0,4,0,-5,0,1]]
G   = [[1/4,0,0], [-1/6,-1/6,-1/6], [-1/6,1/6,-1/6],
       [1/24,1/12,1/6], [1/24,-1/12,1/6], [0,0,1]]
A^T = [[1,1,1,1,1,0], [0,1,-1,2,-2,0], [0,1,1,4,4,0], [0,1,-1,8,-8,1]]
"""
from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(n: int, m: int) -> int:
    return (n + m - 1) // m * m


def transform_weights43(kernel: jnp.ndarray) -> jnp.ndarray:
    """HWIO (3,3,Ci,Co) -> U (36, Ci, Co) = (G k G^T) per channel pair, fp32."""
    g = jnp.asarray(
        [[1 / 4, 0, 0], [-1 / 6, -1 / 6, -1 / 6], [-1 / 6, 1 / 6, -1 / 6],
         [1 / 24, 1 / 12, 1 / 6], [1 / 24, -1 / 12, 1 / 6], [0, 0, 1]],
        jnp.float32)
    k = kernel.astype(jnp.float32)                      # (3, 3, Ci, Co)
    u = jnp.einsum("ar,rsco->asco", g, k)               # (6, 3, Ci, Co)
    u = jnp.einsum("bs,asco->abco", g, u)               # (6, 6, Ci, Co)
    return u.reshape(36, *kernel.shape[2:])


def _combine6(g):
    """Apply B^T along a 6-slot axis given the slots g[0..5]; returns c[0..5]."""
    return (
        4.0 * g[0] - 5.0 * g[2] + g[4],
        -4.0 * g[1] - 4.0 * g[2] + g[3] + g[4],
        4.0 * g[1] - 4.0 * g[2] - g[3] + g[4],
        -2.0 * g[1] - g[2] + 2.0 * g[3] + g[4],
        2.0 * g[1] - g[2] - 2.0 * g[3] + g[4],
        4.0 * g[1] - 5.0 * g[3] + g[5],
    )


def _wino43_compute(q, u_ref, b_ref, o_ref, *, bh: int, width: int,
                    cp: int, c_out: int):
    """q: (bh+4, wq, 4cp) fp-any. Output block o_ref: (1, bh, W/4, 4co)."""
    t = bh // 4
    txw = width // 4

    qf = q.astype(jnp.float32)
    # column slots: winograd col k of tile j = merged group j lane-half k for
    # k<4; k=4,5 are the NEXT group's halves 0,1 (free untiled-dim shift)
    g = [qf[:, 0:txw, k * cp:(k + 1) * cp] for k in range(4)] + [
        qf[:, 1:txw + 1, 0:cp], qf[:, 1:txw + 1, cp:2 * cp]]
    cs = _combine6(g)                              # 6 x (bh+4, txw, cp)

    ms = {}
    for b in range(6):
        cb = cs[b].reshape((bh + 4) // 4, 4, txw, cp)
        e = [cb[0:t, r] for r in range(4)] + [cb[1:t + 1, 0], cb[1:t + 1, 1]]
        v = _combine6(e)                           # a = 0..5, (T, txw, cp)
        for a in range(6):
            ms[(a, b)] = jax.lax.dot_general(
                v[a].astype(o_ref.dtype).reshape(t * txw, cp),
                u_ref[6 * a + b],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                      # (T*txw, Co) fp32

    bias = b_ref[0].astype(jnp.float32)
    # A^T on rows: P[i][b] = sum_a A^T[i,a] m[a,b]
    rows = []
    for i in range(4):
        if i == 0:
            p = [ms[(0, b)] + ms[(1, b)] + ms[(2, b)] + ms[(3, b)] + ms[(4, b)]
                 for b in range(6)]
        elif i == 1:
            p = [ms[(1, b)] - ms[(2, b)] + 2.0 * ms[(3, b)] - 2.0 * ms[(4, b)]
                 for b in range(6)]
        elif i == 2:
            p = [ms[(1, b)] + ms[(2, b)] + 4.0 * ms[(3, b)] + 4.0 * ms[(4, b)]
                 for b in range(6)]
        else:
            p = [ms[(1, b)] - ms[(2, b)] + 8.0 * ms[(3, b)] - 8.0 * ms[(4, b)]
                 + ms[(5, b)] for b in range(6)]
        y0 = p[0] + p[1] + p[2] + p[3] + p[4] + bias
        y1 = p[1] - p[2] + 2.0 * p[3] - 2.0 * p[4] + bias
        y2 = p[1] + p[2] + 4.0 * p[3] + 4.0 * p[4] + bias
        y3 = p[1] - p[2] + 8.0 * p[3] - 8.0 * p[4] + p[5] + bias
        y = jnp.concatenate([y0, y1, y2, y3], axis=-1)   # (T*txw, 4Co)
        rows.append(y.reshape(t, txw, 4 * c_out).astype(o_ref.dtype))
    full = jnp.stack(rows, axis=1).reshape(bh, txw, 4 * c_out)
    o_ref[0] = full


def _wino43_kernel_dma(x_any, u_ref, b_ref, o_ref, xs_ref, sems, *, bh: int,
                       width: int, cp: int, c_out: int, n_tiles: int,
                       total: int):
    bi = pl.program_id(0)
    ti = pl.program_id(1)
    idx = bi * n_tiles + ti

    def dma(i_lin, slot):
        tbi = jax.lax.div(i_lin, n_tiles)
        tti = jax.lax.rem(i_lin, n_tiles)
        return pltpu.make_async_copy(
            x_any.at[tbi, pl.ds(tti * bh, bh + 4)],
            xs_ref.at[slot], sems.at[slot])

    slot = jax.lax.rem(idx, 2)

    @pl.when(idx == 0)
    def _():
        dma(idx, slot).start()

    @pl.when(idx + 1 < total)
    def _():
        dma(idx + 1, 1 - slot).start()

    dma(idx, slot).wait()
    _wino43_compute(xs_ref[slot], u_ref, b_ref, o_ref, bh=bh, width=width,
                    cp=cp, c_out=c_out)


@functools.partial(
    jax.jit, static_argnames=("block_rows", "interpret"))
def conv3x3_winograd43(
    x: jnp.ndarray,        # (B, H, W, C_in)
    kernel: jnp.ndarray,   # (3, 3, C_in, C_out) HWIO
    bias: Optional[jnp.ndarray] = None,
    u: Optional[jnp.ndarray] = None,   # hoisted (36, C_in, C_out) transform
    block_rows: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
    """3x3 stride-1 same-pad conv via Winograd F(4x4,3x3). H, W % 4 == 0."""
    b, h, w, c_in = x.shape
    c_out = kernel.shape[-1]
    dtype = x.dtype
    assert h % 4 == 0 and w % 4 == 0, (h, w)
    if bias is None:
        bias = jnp.zeros((c_out,), jnp.float32)

    cp = _round_up(c_in, 128)
    bh = min(block_rows, h)
    bh = max(4, bh - bh % 4)
    pad_h = (-h) % bh
    hp = h + pad_h
    n_tiles = hp // bh
    # col tile j needs padded cols 4j..4j+5 (left pad 1); groups of 4 merged
    # into 4cp lanes; wq padded to a multiple of 8 (DMA slice alignment)
    wq = _round_up((w + 2 + 3) // 4, 8)
    xp = jnp.pad(x, ((0, 0), (1, 3 + pad_h), (1, 4 * wq - w - 1),
                     (0, cp - c_in)))
    x_m = xp.reshape(b, hp + 4, wq, 4 * cp)

    if u is None:
        u = transform_weights43(kernel)            # (36, C_in, Co)
    u = u.astype(dtype)
    if cp != c_in:
        u = jnp.pad(u, ((0, 0), (0, cp - c_in), (0, 0)))

    out = pl.pallas_call(
        functools.partial(_wino43_kernel_dma, bh=bh, width=w, cp=cp,
                          c_out=c_out, n_tiles=n_tiles, total=b * n_tiles),
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bh, w // 4, 4 * c_out),
                               lambda bi, i: (bi, i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, hp, w // 4, 4 * c_out), dtype),
        scratch_shapes=[
            pltpu.VMEM((2, bh + 4, wq, 4 * cp), dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * hp * w * (36 // 16) * cp * c_out,
            bytes_accessed=b * hp * w * (4 * cp + c_out) * 2,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(x_m, u, bias.reshape(1, c_out).astype(jnp.float32))
    out = out.reshape(b, hp, w, c_out)
    return out[:, :h]


def wino43_wins(h: int, w: int, c_in: int, c_out: int) -> bool:
    """Shape rule: the large-spatial lane-aligned decoder resblocks, where
    XLA's direct conv is compute-bound at peak and the 4x MAC cut is the only
    remaining lever. Small spatial (<=64) makes the 36 per-tile matmuls too
    skinny (M = bh/4 * W/4 rows); misaligned channels (e.g. the UNet's 320)
    lose the FLOP advantage to padding."""
    if os.environ.get("MDT_WINO43", "1") == "0":
        return False
    cp = _round_up(c_in, 128)
    weight_vmem = 36 * cp * c_out * 2
    return (h % 4 == 0 and w % 4 == 0 and min(h, w) >= 128
            and c_in % 128 == 0 and c_out % 128 == 0
            and weight_vmem <= 40 * 1024 * 1024)


@jax.custom_vjp
def conv3x3_winograd43_ad(x, kernel, bias):
    """conv3x3_winograd43 with an XLA-direct-conv backward pass."""
    return conv3x3_winograd43(x, kernel, bias)


# shared with F(2x2): same-dtype direct conv whose docs explain why the
# output must NOT be preferred-fp32 (the lax conv transpose rule rejects
# mixed-dtype cotangents during VJP)
from minddiffusion_tpu.ops.winograd import _direct_ref  # noqa: E402


def _wino43_fwd(x, kernel, bias):
    return conv3x3_winograd43(x, kernel, bias), (x, kernel, bias)


def _wino43_bwd(res, g):
    x, kernel, bias = res
    _, vjp = jax.vjp(_direct_ref, x, kernel, bias)
    return vjp(g)


conv3x3_winograd43_ad.defvjp(_wino43_fwd, _wino43_bwd)
