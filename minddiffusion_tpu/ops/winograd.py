"""Winograd F(2x2, 3x3) convolution — Pallas TPU kernel.

Direct 3x3 conv spends 9 MACs per output-channel-pixel; Winograd F(2x2,3x3)
spends 16 MACs per 2x2-pixel tile = 4 per pixel, a 2.25x FLOP reduction on
the MXU (the transforms are cheap VPU adds). XLA:TPU's direct conv is
already excellent at SD shapes (111-190 TFLOP/s, xprof-verified), so the
FLOP cut only pays where the kernel's own matmul efficiency stays above
~45% of XLA's — the low/mid-resolution wide-channel resblocks (see
wino_wins). Wired into models/layers.conv3x3; e2e UNet step 89.0 -> 84.8 ms
with this kernel at its winning shapes.

Scheme (per (batch, row-tile) grid program, all in VMEM):
  input tile (bh+2, W+2, C) -- host-side halo gather, like ops/conv3x3 --
  1. column phase: lane-merge even/odd columns ((W+2)/2, 2C) and a one-group
     shifted copy; B^T column combos give c0..c3 (bh+2, Tx, C)
  2. row phase: stride-2 PLANE slices (free: leading dims are untiled) give
     the 16 transformed coords V[a,b] (T, Tx, C)
  3. 16 MXU matmuls V[a,b] @ U[a,b] with U = G k G^T (host-precomputed,
     (16, C, Co), grid-resident)
  4. inverse transform A^T M A (fp32 VPU adds) and lane-unmerge back to
     (bh, W, Co), + bias.

Transforms run in fp32 (bf16 inputs upcast on read); matmuls bf16 with fp32
accumulation — numerics land within ~2x of XLA's direct bf16 conv error
(tests/test_winograd.py checks against the fp32 direct conv).

B^T = [[1,0,-1,0],[0,1,1,0],[0,-1,1,0],[0,1,0,-1]]
G   = [[1,0,0],[.5,.5,.5],[.5,-.5,.5],[0,0,1]]
A^T = [[1,1,1,0],[0,1,-1,-1]]
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from minddiffusion_tpu.utils.flags import flags


def _round_up(n: int, m: int) -> int:
    return (n + m - 1) // m * m


def transform_weights(kernel: jnp.ndarray) -> jnp.ndarray:
    """HWIO (3,3,Cin,Co) -> U (16, Cin, Co) = (G k G^T) per channel pair, fp32."""
    g = jnp.asarray(
        [[1.0, 0.0, 0.0], [0.5, 0.5, 0.5], [0.5, -0.5, 0.5], [0.0, 0.0, 1.0]],
        jnp.float32)
    k = kernel.astype(jnp.float32)                      # (3, 3, Ci, Co)
    u = jnp.einsum("ar,rsco->asco", g, k)               # (4, 3, Ci, Co)
    u = jnp.einsum("bs,asco->abco", g, u)               # (4, 4, Ci, Co)
    return u.reshape(16, *kernel.shape[2:])


def _wino_kernel(x_ref, u_ref, b_ref, o_ref, *, bh: int, width: int,
                 cp: int, c_out: int, fp32_transform: bool):
    """One (batch, row-tile) program. See module docstring for phases.

    x_ref:  (1, 1, bh+2, (W+4)//2, 2*cp)  even|odd column-merged halo tile
            (W+4 columns so the +1-group shift stays inside the tile — the
            middle dim is untiled, so the shifted slices below are free)
    u_ref:  (16, cp, c_out) transformed weights (grid-resident)
    b_ref:  (1, c_out)
    o_ref:  (1, bh, W//2, 2*c_out)  column-pair lane-merged (host un-merges)
    """
    _wino_compute(x_ref[0, 0], u_ref, b_ref, o_ref, bh=bh, width=width,
                  cp=cp, c_out=c_out, fp32_transform=fp32_transform)


def _wino_kernel_dma_gn(x_any, u_ref, b_ref, m_ref, a_ref, cm_ref, o_ref,
                        xs_ref, sems, *, bh: int, width: int, cp: int,
                        c_out: int, n_tiles: int, total: int, h: int,
                        fp32_transform: bool, premerged: bool = False,
                        wcols_out: int = 0):
    """DMA variant with the fused GroupNorm+SiLU prologue (see _wino_compute).
    m_ref/a_ref: (B, 2cp) fp32 per-batch affine rows; cm_ref: (wcols, 2cp)
    {0,1} interior-column mask.

    `premerged`: x_any is an UNPADDED merged array (B, H, wcols, 2cp) — the
    previous wino conv's A-form output (resblock conv chains). The window
    copies into scratch rows [1, h+1); the halo rows 0 and h+1 hold stale
    scratch garbage that the gn row mask zeroes before any math (so no
    memset is needed). Requires n_tiles == 1 (no interior row halos exist
    without a host pad)."""
    bi = pl.program_id(0)
    ti = pl.program_id(1)
    idx = bi * n_tiles + ti

    def dma(i_lin, slot):
        tbi = jax.lax.div(i_lin, n_tiles)
        tti = jax.lax.rem(i_lin, n_tiles)
        if premerged:
            return pltpu.make_async_copy(
                x_any.at[tbi], xs_ref.at[slot, pl.ds(1, bh)], sems.at[slot])
        return pltpu.make_async_copy(
            x_any.at[tbi, pl.ds(tti * bh, bh + 2)],
            xs_ref.at[slot], sems.at[slot])

    slot = jax.lax.rem(idx, 2)

    @pl.when(idx == 0)
    def _():
        dma(idx, slot).start()

    @pl.when(idx + 1 < total)
    def _():
        dma(idx + 1, 1 - slot).start()

    dma(idx, slot).wait()
    gn = (m_ref[bi], a_ref[bi], cm_ref[...], ti * bh, h)
    _wino_compute(xs_ref[slot], u_ref, b_ref, o_ref, bh=bh, width=width,
                  cp=cp, c_out=c_out, fp32_transform=fp32_transform, gn=gn,
                  wcols_out=wcols_out)


def _wino_kernel_dma(x_any, u_ref, b_ref, o_ref, xs_ref, sems, *, bh: int,
                     width: int, cp: int, c_out: int, n_tiles: int,
                     total: int, fp32_transform: bool):
    """DMA variant: x stays whole in ANY memory space as the merged
    (B, Hp+2, (W+4)/2, 2cp) array; each program async-copies its OWN
    (bh+2)-row halo window (overlapping windows — inexpressible as a
    BlockSpec, which is why the old path materialized a gathered tile array
    plus a transpose + two layout copies on the host side, ~45 ms/batch in
    the SD2 profile). Double-buffered: each program kicks off the next
    window's copy before computing its own."""
    bi = pl.program_id(0)
    ti = pl.program_id(1)
    idx = bi * n_tiles + ti

    def dma(i_lin, slot):
        tbi = jax.lax.div(i_lin, n_tiles)
        tti = jax.lax.rem(i_lin, n_tiles)
        return pltpu.make_async_copy(
            x_any.at[tbi, pl.ds(tti * bh, bh + 2)],
            xs_ref.at[slot], sems.at[slot])

    slot = jax.lax.rem(idx, 2)

    @pl.when(idx == 0)
    def _():
        dma(idx, slot).start()

    @pl.when(idx + 1 < total)
    def _():
        dma(idx + 1, 1 - slot).start()

    dma(idx, slot).wait()
    _wino_compute(xs_ref[slot], u_ref, b_ref, o_ref, bh=bh, width=width,
                  cp=cp, c_out=c_out, fp32_transform=fp32_transform)


def _wino_compute(q, u_ref, b_ref, o_ref, *, bh: int, width: int,
                  cp: int, c_out: int, fp32_transform: bool,
                  gn: Optional[tuple] = None, wcols_out: int = 0):
    """Shared transform-matmul-inverse body. q: (bh+2, (W+4)/2, 2cp).

    `gn` = (mult_row, add_row, col_mask, row_lo, h) fuses the GroupNorm+SiLU
    prologue: interior elements become silu(q*mult + add); padding positions
    (identified by col_mask and the global row range) stay exactly 0 so the
    halo math is unchanged. mult/add are this batch element's (2cp,) affine
    vectors, col_mask is (wcols, 2cp) {0,1}, row_lo is the tile's first
    global PADDED row index, h the unpadded height."""
    t = bh // 2
    tx = width // 2

    if gn is not None:
        mult_row, add_row, col_mask, row_lo, h = gn
        qf = q.astype(jnp.float32) * mult_row + add_row
        qf = qf * jax.nn.sigmoid(qf)               # silu
        rows = row_lo + jax.lax.broadcasted_iota(
            jnp.int32, (bh + 2, 1, 1), 0)          # global padded row ids
        row_ok = (rows >= 1) & (rows <= h)
        q = jnp.where(row_ok & (col_mask[None] if col_mask.ndim == 2
                                else col_mask), qf, 0.0)

    tdt = jnp.float32 if fp32_transform else q.dtype
    # column combos (B^T applied to the W axis); d0..d3 are the 4 winograd
    # columns of each tile: evens, odds, evens+1, odds+1 — the +1 variants
    # are the next lane-merged column group of the SAME tile
    ec = q[:, 0:tx, 0:cp].astype(tdt)
    oc = q[:, 0:tx, cp:2 * cp].astype(tdt)
    ec1 = q[:, 1:tx + 1, 0:cp].astype(tdt)
    oc1 = q[:, 1:tx + 1, cp:2 * cp].astype(tdt)
    c0 = ec - ec1
    c1 = oc + ec1
    c2 = ec1 - oc
    c3 = oc - oc1                                  # each (bh+2, Tx, cp)

    ms = {}
    for b in range(4):
        cb = (c0, c1, c2, c3)[b]
        # row combos via even/odd plane regrouping: leading dims are untiled,
        # so the reshape and unit slices are free (Mosaic rejects stride-2
        # vector slices, so no lax.slice with strides here)
        cb2 = cb.reshape((bh + 2) // 2, 2, tx, cp)
        e0 = cb2[0:t, 0]
        o0 = cb2[0:t, 1]
        e1 = cb2[1:t + 1, 0]
        o1 = cb2[1:t + 1, 1]
        v = (e0 - e1, o0 + e1, e1 - o0, o0 - o1)   # a = 0..3, (T, Tx, cp)
        for a in range(4):
            ms[(a, b)] = jax.lax.dot_general(
                v[a].astype(o_ref.dtype).reshape(t * tx, cp),
                u_ref[4 * a + b],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                       # (T*Tx, Co) fp32

    bias = b_ref[0].astype(jnp.float32)
    # inverse transform: P[i][b] = sum_a A^T[i,a] M[a,b]; Y[i][j] = sum_b A^T[j,b] P[i][b]
    rows = []
    for i in range(2):
        if i == 0:
            p = [ms[(0, b)] + ms[(1, b)] + ms[(2, b)] for b in range(4)]
        else:
            p = [ms[(1, b)] - ms[(2, b)] - ms[(3, b)] for b in range(4)]
        y0 = p[0] + p[1] + p[2] + bias              # (T*Tx, Co) cols j=0
        y1 = p[1] - p[2] - p[3] + bias              # cols j=1
        # keep the two column phases lane-merged: the (…, Tx, 2Co) ->
        # (…, W, Co) un-merge is a free host-side reshape (same HBM bytes),
        # but an unsupported lane->sublane shape cast inside Mosaic
        y = jnp.concatenate([y0, y1], axis=-1)      # (T*Tx, 2Co)
        rows.append(y.reshape(t, tx, 2 * c_out).astype(o_ref.dtype))
    # interleave even/odd output rows on the (free) leading axis: no strided
    # ref stores on TPU
    full = jnp.stack(rows, axis=1).reshape(bh, tx, 2 * c_out)
    if wcols_out:
        # A-form merged store for a chained next wino conv: group g holds
        # (col 2g-1 | col 2g) in its lane halves — exactly the kernel's own
        # expected input convention, left halo (col -1) and right alignment
        # pads zeroed. full[..., :co] = col 2j (B-even), full[..., co:] =
        # col 2j+1 (B-odd); A-even-half shifts the B-odd lanes one group
        # right. All concats are plain sublane/lane VMEM copies.
        z = lambda g: jnp.zeros((bh, g, c_out), o_ref.dtype)
        half1 = jnp.concatenate(
            [z(1), full[:, :, c_out:]] + ([z(wcols_out - tx - 1)]
                                          if wcols_out > tx + 1 else []),
            axis=1)
        half2 = jnp.concatenate(
            [full[:, :, :c_out]] + ([z(wcols_out - tx)]
                                    if wcols_out > tx else []), axis=1)
        o_ref[0] = jnp.concatenate([half1, half2], axis=-1)
        return
    o_ref[0] = full


def wino_chain_ok(h: int, w: int, c_mid: int) -> bool:
    """Whether a resblock conv_in -> conv_out pair at this shape can chain
    through the merged A-form (premerged input needs a single row tile —
    h <= the default block_rows — and 128-aligned mid channels)."""
    import os

    # chains exchange A-form tiles, which only the DMA+GN kernel path can
    # produce/consume — the MDT_WINO_TUNE=dma=0 opt-out must disable chaining too
    # (otherwise conv3x3_winograd's merged-I/O asserts fire)
    return (flags().wino_chain and flags().wino_dma
            and h % 2 == 0 and w % 2 == 0 and h <= 48 and c_mid % 128 == 0)


def merged_channel_sums(h_m: jnp.ndarray, c: int):
    """Per-channel spatial sums (s1, s2) of an A-form merged array
    (B, H, wcols, 2*cp): channel k lives in lanes k and cp+k; halo/pad
    positions are exact zeros (the merged store writes them), so plain sums
    over (rows, groups) give the true spatial sums. Feeds GN-stat folds for
    chained wino convs without un-merging the activation."""
    x32 = h_m.astype(jnp.float32)
    s1 = jnp.sum(x32, axis=(1, 2))
    s2 = jnp.sum(x32 * x32, axis=(1, 2))
    cp = h_m.shape[-1] // 2
    return s1[:, :c] + s1[:, cp:cp + c], s2[:, :c] + s2[:, cp:cp + c]


@functools.partial(
    jax.jit, static_argnames=("block_rows", "fp32_transform", "interpret",
                              "dma", "out_merged", "in_dims"))
def _conv3x3_winograd_jit(
    x: jnp.ndarray,        # (B, H, W, C_in); A-form (B, H, wcols, 2C_in) with in_dims
    kernel: jnp.ndarray,   # (3, 3, C_in, C_out) HWIO
    bias: Optional[jnp.ndarray] = None,
    u: Optional[jnp.ndarray] = None,   # hoisted (16, C_in, C_out) transform
    gn_mult: Optional[jnp.ndarray] = None,   # (B, C_in) fp32 affine prologue
    gn_add: Optional[jnp.ndarray] = None,    # (B, C_in) fp32
    block_rows: int = 32,
    fp32_transform: bool = True,
    interpret: bool = False,
    dma: Optional[bool] = None,
    out_merged: bool = False,
    in_dims: Optional[tuple] = None,
) -> jnp.ndarray:
    """3x3 stride-1 same-pad conv via Winograd F(2x2,3x3). H and W even.

    Pass `u` (= transform_weights(kernel), any dtype) to skip the in-graph
    weight transform — used by the inference pipelines to hoist the
    loop-invariant transform out of the sampler scan (capture pass).

    `gn_mult`/`gn_add` fuse the GroupNorm(+SiLU) prologue into the kernel:
    the conv input becomes silu(x * mult + add) per (batch, channel) WITHOUT
    materializing the normalized activation in HBM (a full extra read+write
    pass plus a relayout copy per conv otherwise). On the DMA path the fold
    happens in-kernel with pad masking; otherwise it is applied elementwise
    before padding (numerically identical — silu in fp32 either way).

    `dma` (default on; MDT_WINO_TUNE=dma=0 opts out): the kernel fetches its own
    overlapping halo windows via async copies instead of the host
    materializing a gathered tile array (see _wino_kernel_dma).
    """
    premerged = in_dims is not None
    if premerged:
        h, w = in_dims
        b = x.shape[0]
        c_in = x.shape[-1] // 2
    else:
        b, h, w, c_in = x.shape
    c_out = kernel.shape[-1]
    dtype = x.dtype
    assert h % 2 == 0 and w % 2 == 0, (h, w)
    if bias is None:
        bias = jnp.zeros((c_out,), jnp.float32)
    has_gn = gn_mult is not None
    if premerged or out_merged:
        # merged-chain I/O needs a SINGLE row tile (a premerged array has no
        # interior row halos, and the A-form store indexes one tile) — widen
        # the row block to the full height (h <= 48 per wino_chain_ok keeps
        # the scratch footprint small)
        block_rows = max(block_rows, h)
    if premerged:
        # A-form chained input: only the masked in-kernel prologue can zero
        # the halo/pad positions, so this path is DMA+GN only.
        assert dma and has_gn, "premerged input requires the DMA+GN path"
        assert c_in % 128 == 0, c_in
        assert h <= block_rows and h % 2 == 0, (h, block_rows)
    if out_merged:
        assert dma and has_gn, "merged output requires the DMA+GN path"
        assert h <= block_rows, (h, block_rows)
    if has_gn and not dma:
        # no in-kernel masking on the gather path: fold on the host instead
        xf = x.astype(jnp.float32) * gn_mult[:, None, None, :] \
            + gn_add[:, None, None, :]
        x = (xf * jax.nn.sigmoid(xf)).astype(dtype)
        has_gn = False

    cp = _round_up(c_in, 128)
    bh = min(block_rows, h)
    if bh % 2:
        bh += 1
    pad_h = (-h) % bh
    hp = h + pad_h
    n_tiles = hp // bh
    wcols = (w + 4) // 2
    if dma:
        # the async halo-window copy requires the (second-minor) column-pair
        # dim 8-aligned ("slice shape must be aligned to tiling")
        wcols = _round_up(wcols, 8)
    if premerged:
        assert x.shape == (b, h, wcols, 2 * cp), (x.shape, (b, h, wcols, 2 * cp))

    # C padded so the even/odd lane-merge keeps 128-aligned halves. W padded
    # so the whole tile lane-merges with a contiguous reshape — no
    # sliced/shifted copies (the kernel takes its +1-group shifted views
    # from the untiled middle dim). Skipped entirely for premerged input.
    if not premerged:
        xp = jnp.pad(x, ((0, 0), (1, 1 + pad_h), (1, 2 * wcols - w - 1),
                         (0, cp - c_in)))

    if u is None:
        u = transform_weights(kernel)               # (16, C_in, Co)
    u = u.astype(dtype)
    if cp != c_in:
        u = jnp.pad(u, ((0, 0), (0, cp - c_in), (0, 0)))

    if dma:
        if premerged:
            x_m = x                                 # already A-form merged
        else:
            x_m = xp.reshape(b, hp + 2, wcols, 2 * cp)  # lane-merge (one pass)
        gn_ops = None
        if has_gn:
            mp_ = jnp.pad(gn_mult.astype(jnp.float32), ((0, 0), (0, cp - c_in)))
            ap_ = jnp.pad(gn_add.astype(jnp.float32), ((0, 0), (0, cp - c_in)))
            cols = jnp.arange(wcols)
            ch_ok = jnp.arange(cp) < c_in
            even_ok = (cols * 2 >= 1) & (cols * 2 <= w)     # col 0 = left pad
            odd_ok = cols * 2 + 1 <= w
            col_mask = jnp.concatenate(
                [even_ok[:, None] & ch_ok[None], odd_ok[:, None] & ch_ok[None]],
                axis=-1).astype(jnp.float32) > 0            # (wcols, 2cp) bool
            gn_ops = (jnp.concatenate([mp_, mp_], axis=-1),
                      jnp.concatenate([ap_, ap_], axis=-1), col_mask)
        out = _wino_pallas_dma(x_m, u, bias, gn_ops, b=b, h=h, hp=hp, w=w,
                               bh=bh, n_tiles=n_tiles, wcols=wcols, cp=cp,
                               c_out=c_out, dtype=dtype,
                               fp32_transform=fp32_transform,
                               interpret=interpret, premerged=premerged,
                               wcols_out=wcols if out_merged else 0)
        if out_merged:
            # A-form (B, H, wcols, 2*C_out): feed to the next chained wino
            # conv via in_dims=(h, w); stats/sums read it directly (pads are
            # exact zeros)
            return out
    else:
        row_idx = (jnp.arange(n_tiles)[:, None] * bh
                   + jnp.arange(bh + 2)[None, :])   # (n_tiles, bh+2)
        tiles = xp[:, row_idx]                      # (B, n, bh+2, W+4, cp)
        x_t = tiles.reshape(b, n_tiles, bh + 2, wcols, 2 * cp)
        out = _wino_pallas(x_t, u, bias, b=b, hp=hp, w=w, bh=bh,
                           n_tiles=n_tiles, wcols=wcols, cp=cp, c_out=c_out,
                           dtype=dtype, fp32_transform=fp32_transform,
                           interpret=interpret)
    # un-merge the lane-paired columns: same HBM layout, metadata-only reshape
    out = out.reshape(b, hp, w, c_out)
    return out[:, :h]


def conv3x3_winograd(
    x, kernel, bias=None, u=None, gn_mult=None, gn_add=None,
    block_rows: int = 32, fp32_transform: bool = True,
    interpret: bool = False, dma: Optional[bool] = None,
    out_merged: bool = False, in_dims: Optional[tuple] = None,
):
    """Winograd F(2x2,3x3) conv — see _conv3x3_winograd_jit for the full
    contract. This thin wrapper resolves the dma-variant flag default
    OUTSIDE the jit so the flag participates in the dispatch (an env read
    inside the traced body is baked into the first trace and silently
    ignored on later in-process flips — jit caches key on dma=None)."""
    import os

    if dma is None:
        dma = flags().wino_dma
    return _conv3x3_winograd_jit(
        x, kernel, bias, u, gn_mult, gn_add, block_rows=block_rows,
        fp32_transform=fp32_transform, interpret=interpret, dma=dma,
        out_merged=out_merged, in_dims=in_dims)


def _wino_pallas_dma(x_m, u, bias, gn_ops, *, b, h, hp, w, bh, n_tiles,
                     wcols, cp, c_out, dtype, fp32_transform, interpret,
                     premerged=False, wcols_out=0):
    has_gn = gn_ops is not None
    if has_gn:
        kernel = functools.partial(
            _wino_kernel_dma_gn, bh=bh, width=w, cp=cp, c_out=c_out,
            n_tiles=n_tiles, total=b * n_tiles, h=h,
            fp32_transform=fp32_transform, premerged=premerged,
            wcols_out=wcols_out)
    else:
        assert not premerged and not wcols_out
        kernel = functools.partial(
            _wino_kernel_dma, bh=bh, width=w, cp=cp, c_out=c_out,
            n_tiles=n_tiles, total=b * n_tiles,
            fp32_transform=fp32_transform)
    in_specs = [
        # pin to HBM: under ANY the compiler may place the whole array in
        # VMEM, where the dynamic halo-window slice fails to lower
        pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
    ] + ([pl.BlockSpec(memory_space=pltpu.VMEM)] * 3 if has_gn else [])
    args = [x_m, u, bias.reshape(1, c_out).astype(jnp.float32)]
    if has_gn:
        args += list(gn_ops)
    ocols = wcols_out if wcols_out else w // 2
    return pl.pallas_call(
        kernel,
        grid=(b, n_tiles),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, bh, ocols, 2 * c_out),
                               lambda bi, i: (bi, i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, hp, ocols, 2 * c_out), dtype),
        scratch_shapes=[
            pltpu.VMEM((2, bh + 2, wcols, 2 * cp), dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * hp * w * 4 * cp * c_out,
            bytes_accessed=b * hp * w * (4 * cp + c_out) * 2,
            transcendentals=b * hp * w * cp if has_gn else 0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            # manual cross-step double buffering requires sequential order
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(*args)


def _wino_pallas(x_t, u, bias, *, b, hp, w, bh, n_tiles, wcols, cp,
                 c_out, dtype, fp32_transform, interpret):
    return pl.pallas_call(
        functools.partial(_wino_kernel, bh=bh, width=w, cp=cp, c_out=c_out,
                          fp32_transform=fp32_transform),
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec((1, 1, bh + 2, wcols, 2 * cp),
                         lambda bi, i: (bi, i, 0, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bh, w // 2, 2 * c_out),
                               lambda bi, i: (bi, i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, hp, w // 2, 2 * c_out), dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * hp * w * 4 * cp * c_out,   # 16 MACs per 2x2 tile
            bytes_accessed=b * hp * w * (4 * cp + c_out) * 2,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=interpret,
    )(x_t, u, bias.reshape(1, c_out).astype(jnp.float32))


def wino_wins(h: int, w: int, c_in: int, c_out: int,
              itemsize: int = 2) -> bool:
    """Static shape rule for where winograd measured faster than XLA's direct
    conv on v5e (benchmarks/bench_conv64.py, 100-step scans — the 20-step
    numbers carried a ~2 ms/step tunnel-dispatch bias that inflated every
    ratio). Corrected truth: XLA direct conv runs at 111-190 TFLOP/s at SD
    shapes; winograd only beats it at the low-resolution wide-channel
    resblocks (16²x1280: 0.84 vs 0.94 ms). 64²x320 (1.96 vs 1.08), 32²x640
    (0.98 vs 0.93), 8² and VAE-decoder shapes all lose — excluded. The VMEM
    cap rejects the up-path skip-concat convs (C_in up to 2560, whose
    16x(cp, Co) resident transformed weights alone exceed scoped VMEM)."""
    cp = _round_up(c_in, 128)
    # U is cast to the activation dtype in-kernel: fp32 models double the
    # grid-resident footprint (itemsize=4), so fewer shapes qualify there
    weight_vmem = 16 * cp * c_out * itemsize   # U, grid-resident
    f = flags()
    # MDT_WINO_TUNE hmax=/cmin= A/B knobs: the early kernel (host-pad halo,
    # redundant shifted tile) lost at 64²x320; hmax=64,cmin=320 re-tests the
    # DMA/no-xs kernel there. Large-spatial extensions (the old
    # MDT_WINO_LARGE) were measured losses at every tried setting (VAE tiers
    # 1.891/1.909 vs 1.923; GLIDE 256²x192 1.293) — deleted, see ROADMAP.
    c_min = f.wino_cmin if f.wino_cmin is not None else 512
    h_max = f.wino_hmax if f.wino_hmax is not None else 48
    return (h % 2 == 0 and w % 2 == 0
            and 12 <= min(h, w) <= h_max and c_in >= c_min
            and weight_vmem <= 56 * 1024 * 1024)


@jax.custom_vjp
def conv3x3_winograd_ad(x, kernel, bias):
    """conv3x3_winograd with an XLA-direct-conv backward pass (the Pallas
    kernel has no VJP; training gradients route through lax.conv)."""
    return conv3x3_winograd(x, kernel, bias)


def _direct_ref(x, kernel, bias):
    # NO preferred fp32 output here: the conv transpose rule requires the
    # cotangent dtype to match the operands, so a mixed bf16-operand/fp32-out
    # conv cannot be differentiated (TypeError in lax transpose). Plain
    # same-dtype conv transposes fine; the MXU accumulates fp32 either way.
    y = jax.lax.conv_general_dilated(
        x, kernel.astype(x.dtype), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + bias.astype(y.dtype)


def _wino_fwd(x, kernel, bias):
    return conv3x3_winograd(x, kernel, bias), (x, kernel, bias)


def _wino_bwd(res, g):
    x, kernel, bias = res
    _, vjp = jax.vjp(_direct_ref, x, kernel, bias)
    return vjp(g)


conv3x3_winograd_ad.defvjp(_wino_fwd, _wino_bwd)
