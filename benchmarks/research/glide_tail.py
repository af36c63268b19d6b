"""STATUS: REJECTED (r4h/r4i, same-claim e2e A/Bs) — retired from ops/ in
r5. GLIDE cascade tail=1: 1.9931 vs 2.0064 baseline (−26.5 ms/cascade): at
the SR shapes the taps-in-N GEMM's 27->128 lane padding (4.7x wasted MXU
lanes over 64 grid steps x 27 steps) costs more than the ~43 ms 7.3 TF/s
direct-conv chain it replaces, even with ZERO tiny-channel HBM
materializations — for c_out<=6 the fused XLA direct conv IS the floor
(same lesson as lowco.py, one level deeper). SD2 MDT_SD_TAIL=1: 1.9385 vs
1.9399 — neutral (the SD tail is only ~2 ms/step of XLA time). The working
batch-in-sublanes mechanism (transposed-view operands; B-in-sublanes makes
tap offsets native aligned slices) is recorded in DESIGN.md §15. The
MDT_SD_TAIL / MDT_GLIDE_TUNE=tail flags, the samplers' fused-tail loops,
and the models' return_features plumbing were removed with the retirement.

Fused GLIDE SR sampler tail: GroupNorm-apply + SiLU + the eps-half of the
3x3 out_conv + the DDIM (eta=0) step math, one Pallas pass.

Why (r4d/r4g measured evidence): the SR-stage out_conv (192 -> 6 at 256²,
reference Taichu-GLIDE model/unet.py `self.out`) runs as an XLA fusion at
7.3 TF/s — the 6-channel output pads to 128 MXU lanes (4.7% utilization,
~1.6 ms/step, 43 ms of the 27-step stage). Every FLOP-level fix tried at the
XLA level lost: space-to-depth cannot help a 3x3 (kernel-redundancy x padding
is invariant, models/srgan.py note), and the taps-in-N GEMM + shift-add form
(benchmarks/research/lowco.py) materializes tiny-channel intermediates that
pad to 128 lanes in HBM, so the downstream split/divide consumers read ~21x
padded bytes (-29 ms measured). The surviving shape of the idea is to hold
the WHOLE chain in one kernel so no tiny-channel tensor ever reaches HBM:

    h (B,H,W,192 bf16, pre-out_norm)  --GN affine + SiLU-->  xn
    z = xn @ W54      (taps-in-N GEMM: N = 9 taps x 3 eps channels = 27
                       lanes vs 6 -> ~10x better MXU lane utilization)
    y = shift-add     (9 batch-aligned sublane shifts, VMEM-only)
    eps -> pred_x0 -> clipped-eps -> x_{t-1}   (DDIM eta=0 step,
                       gaussian_diffusion.py ddim path — only the eps half
                       of the model output is live there, the learned-
                       variance half is dead under eta=0)

Layout design (the r4 Pallas-boundary rule, CLAUDE.md): the kernel takes h
through its (H, W, B, C) TRANSPOSED VIEW so the operand's default layout
coincides with the producing convolution's batch-in-sublanes memory order
({3,0,2,1}) — XLA bitcasts instead of inserting a ~0.5 ms relayout copy of
the 201 MB feature map. With B(=8) riding the sublane minor-2 dim, every
spatial tap offset becomes a multiple of 8 sublanes, i.e. a NATIVE aligned
vector slice (this is the batch-in-sublanes kernel-variant mechanism the r4
handoff names; it works here because the lane dim carries the full C=192,
unlike flash-attention's d=64 head slices).

The GroupNorm statistics stay OUTSIDE the kernel as plain jnp reductions:
XLA fuses them into the producing conv as a tuple-output epilogue
(convert_reduce class), which the r4 A/Bs measured as effectively free.

Numerics: GN affine and SiLU in fp32 (cast to bf16 for the GEMM — same
choice as the winograd GN prologue, ops/winograd.py), fp32 accumulation,
and the eps tensor stays fp32 into the sampler math (the unfused path
round-trips eps through the model's bf16 output cast) — identical
contraction up to tap-order reassociation and one fewer bf16 rounding.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _tail_kernel(hp_ref, hc_ref, hn_ref, x_ref, mult_ref, add_ref, wt_ref,
                 wc_ref, coef_ref, o_ref, xs_ref, *, rows: int, width: int,
                 batch: int, nblk: int, co: int, mode: str):
    """Grid (H/rows,). Shapes (per block; bx = B except mode="sd" where the
    conv batch B is the folded CFG batch and bx = B//2 is the latent batch):
      hp/hc/hn_ref: three pipelined views of the SAME (H, W, B, C) bf16
          features — the row above the strip (1 row, clamped at the top
          edge), the strip itself (rows), and the row below (clamped) —
          assembled into the 3x3 conv's halo window in VMEM. Manual
          halo DMA from ANY memory is impossible here: slicing an HBM
          memref needs 128-aligned lane extents, and C=192 is not — but
          plain BlockSpec operands whose lane block equals the full array
          dim are exempt (same exemption ops/gn_stats relies on).
      x_ref: (rows, W, bx, co) f32  current latent block
      mult/add: (B, C) f32          GN affine (rstd*gamma / beta - mean*...)
      wt_ref: (C, 9*co) bf16        taps-in-N conv weights, lane = co*tap + o
      wc_ref: (9*co+1, co) f32      tap-collapse matrix; last row = conv bias
      coef_ref: (1, 4) f32 SMEM     mode="glide": [sr, srm1, sqrt(abar_prev),
                                    sqrt(1-abar_prev)]; mode="sd":
                                    [guidance_scale, cA, cB, 0] with
                                    x_prev = cA*x + cB*eps_guided
      o_ref: (rows, W, bx, co) f32  x_{t-1} block
      xs_ref: (rows+2, W+4, B, C) bf16 scratch (normalized, col-padded window)
    """
    i = pl.program_id(0)
    wp = width + 4

    # GN affine + SiLU in fp32, store bf16 (the GEMM input dtype) into the
    # col-padded window scratch.
    q = jnp.concatenate([hp_ref[...], hc_ref[...], hn_ref[...]], axis=0)
    y = q.astype(jnp.float32) * mult_ref[...] + add_ref[...]
    xs_ref[:, 2:width + 2] = (y * jax.nn.sigmoid(y)).astype(xs_ref.dtype)
    # SAME-pad semantics: the two pad columns each side and any out-of-image
    # halo row must contribute exactly 0 (the affine of a zero/garbage entry
    # is silu(add) != 0, and the clamped edge views duplicate an in-range
    # row — so zero AFTER the affine).
    zero_col = jnp.zeros((rows + 2, 2, batch, xs_ref.shape[-1]), xs_ref.dtype)
    xs_ref[:, 0:2] = zero_col
    xs_ref[:, wp - 2:wp] = zero_col

    zero_row = jnp.zeros((1, wp, batch, xs_ref.shape[-1]), xs_ref.dtype)

    @pl.when(i == 0)
    def _():
        xs_ref[0:1] = zero_row

    @pl.when(i == nblk - 1)
    def _():
        xs_ref[rows + 1:rows + 2] = zero_row

    # Taps-in-N GEMM over the whole halo window (batch rides sublanes, so
    # the merge below only regroups untiled leading dims — layout-free).
    s_in = (rows + 2) * wp * batch
    xn = xs_ref[...].reshape(s_in, xs_ref.shape[-1])
    z = jax.lax.dot_general(xn, wt_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)  # (s_in, 9*co)

    # Shift-add: out center (j, w) sits at flat sublane ((j+1)*wp + w+2)*B;
    # tap (ky, kx) reads offset ((ky-1)*wp + (kx-1))*B — all multiples of
    # B=8, i.e. aligned sublane slices. The contiguous span over all centers
    # keeps every tap slice in range (min start = B, max end = s_in - B).
    span_lo = (wp + 2) * batch
    span = ((rows - 1) * wp + width) * batch
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 9 * co), 1) // co  # tap id
    acc = jnp.zeros((span, 9 * co), jnp.float32)
    for ky in range(3):
        for kx in range(3):
            off = span_lo + ((ky - 1) * wp + (kx - 1)) * batch
            mask = (lane == (ky * 3 + kx)).astype(jnp.float32)
            acc = acc + z[off:off + span] * mask

    # Collapse the 9 tap groups onto the co output channels (+ bias via the
    # appended ones lane) with one constant matmul.
    ones = jnp.ones((span, 1), jnp.float32)
    eps_span = jax.lax.dot_general(
        jnp.concatenate([acc, ones], axis=1), wc_ref[...],
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    # Drop the pad columns: out row j occupies flat [j*wp*B, +W*B) of the span.
    eps = jnp.concatenate(
        [eps_span[j * wp * batch:j * wp * batch + width * batch]
         for j in range(rows)], axis=0)            # (rows*W*B, co)

    if mode == "glide":
        # DDIM eta=0 step (samplers/ancestral.py ddim_sample_loop; reference
        # gaussian_diffusion.py:113-142): pred_x0 from eps, clip, re-derive
        # eps, combine with the abar_prev coefficients.
        sr = coef_ref[0, 0]
        srm1 = coef_ref[0, 1]
        sap = coef_ref[0, 2]
        s1map = coef_ref[0, 3]
        xm = x_ref[...].reshape(rows * width * batch, co)
        xs_scaled = sr * xm
        px0 = jnp.clip(xs_scaled - srm1 * eps, -1.0, 1.0)
        eps2 = (xs_scaled - px0) / srm1
        o_ref[...] = (sap * px0 + s1map * eps2).reshape(
            rows, width, batch, co)
    else:
        # mode == "sd": CFG guide over the [uncond; cond] halves — with the
        # folded batch riding sublanes, the halves are aligned 8-sublane
        # slices (the pair-INTERLEAVED mesh layout would need stride-2
        # slices, which Mosaic forbids — sd_tail_route rejects it) — then
        # the eta=0 DDIM update, which is linear in (x, eps):
        # x_prev = sqrt(a_prev/a_t) * x
        #          + (sqrt(1-a_prev) - sqrt(a_prev*(1-a_t)/a_t)) * eps
        # (samplers/ddim.py step; reference plms.py get_x_prev family).
        scale = coef_ref[0, 0]
        c_x = coef_ref[0, 1]
        c_eps = coef_ref[0, 2]
        bx = batch // 2
        eps4 = eps.reshape(rows, width, batch, co)
        u = eps4[:, :, 0:bx]
        g = u + scale * (eps4[:, :, bx:batch] - u)
        o_ref[...] = c_x * x_ref[...] + c_eps * g


def _tap_major_weights(w_eps: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, C, co) -> (C, 9*co) with lane index = (3*ky + kx) * co + o."""
    _, _, c, co = w_eps.shape
    return jnp.transpose(w_eps, (2, 0, 1, 3)).reshape(c, 9 * co)


def _collapse_matrix(b_eps: jnp.ndarray) -> jnp.ndarray:
    """(9*co+1, co) fp32: rows map lane co*t+o -> channel o, last = bias."""
    import numpy as np

    co = b_eps.shape[0]
    m = np.zeros((9 * co, co), np.float32)
    for t in range(9):
        for o in range(co):
            m[co * t + o, o] = 1.0
    return jnp.concatenate([jnp.asarray(m),
                            b_eps.astype(jnp.float32)[None]], axis=0)


@functools.partial(jax.jit, static_argnames=("block_rows", "interpret"))
def ddim_tail_step(h: jnp.ndarray, x: jnp.ndarray, mult: jnp.ndarray,
                   add: jnp.ndarray, w_eps: jnp.ndarray, b_eps: jnp.ndarray,
                   coefs: jnp.ndarray, block_rows: int = 8,
                   interpret: bool = False) -> jnp.ndarray:
    """x_{t-1} from pre-tail features. h: (B,H,W,C) bf16; x: (B,H,W,3) f32;
    mult/add: (B,C) f32 GN affine; w_eps: (3,3,C,3); b_eps: (3,);
    coefs: (4,) f32 [sr, srm1, sqrt(abar_prev), sqrt(max(1-abar_prev,0))]."""
    return _tail_call(h, x, mult, add, w_eps, b_eps, coefs,
                      block_rows=block_rows, mode="glide",
                      interpret=interpret)


@functools.partial(jax.jit, static_argnames=("block_rows", "interpret"))
def sd_cfg_tail_step(h: jnp.ndarray, x: jnp.ndarray, mult: jnp.ndarray,
                     add: jnp.ndarray, w_eps: jnp.ndarray, b_eps: jnp.ndarray,
                     coefs: jnp.ndarray, block_rows: int = 8,
                     interpret: bool = False) -> jnp.ndarray:
    """SD tail + CFG guide + DDIM(eta=0) update in one pass.

    h: (2B, H, W, C) bf16 pre-out_norm features of the CFG-FOLDED batch
    ([uncond; cond] halves); x: (B, H, W, co) f32 latent;
    w_eps: (3, 3, C, co); coefs: (4,) f32 [guidance_scale, cA, cB, 0] with
    x_prev = cA*x + cB*(u + scale*(c - u)). Returns (B, H, W, co) f32."""
    return _tail_call(h, x, mult, add, w_eps, b_eps, coefs,
                      block_rows=block_rows, mode="sd", interpret=interpret)


def _stack_bytes(rows: int, ww: int, b: int, c: int, co: int,
                 itemsize: int) -> int:
    """Coarse per-grid-step VMEM stack estimate (kernel temporaries + block
    operands, lane dims padded to 128). Tracks Mosaic's accounting only to
    first order — at (rows=8, 256, 8, 192, 3) Mosaic measured 102.7M vs
    ~115M here — so the budget below carries the slack."""
    wp = ww + 4
    win = (rows + 2) * wp * b                    # halo-window sublanes
    span = ((rows - 1) * wp + ww) * b            # shift-add span sublanes
    lane = max(9 * co + 1, 128)
    est = (rows + 2) * ww * b * c * 4            # fp32 affine+SiLU intermediate
    est += win * c * itemsize                    # xs window scratch
    est += win * lane * 4                        # z (taps-in-N GEMM out)
    est += 5 * span * lane * 4                   # acc/slice/mask + concat/eps
    est += 2 * rows * ww * b * c * itemsize      # double-buffered hc block
    est += 4 * ww * b * c * itemsize             # hp/hn halo blocks (x2 buf)
    est += 3 * rows * ww * b * max(co, 128) * 4  # x block (x2 buf) + out
    return est


# vmem_limit_bytes below minus headroom for Mosaic accounting drift (the
# estimator overshoots the one measured point by ~12%, so 80M here keeps the
# true stack comfortably under the 100M limit).
_STACK_BUDGET = 80 * 1024 * 1024


def _tail_call(h, x, mult, add, w_eps, b_eps, coefs, *, block_rows: int,
               mode: str, interpret: bool) -> jnp.ndarray:
    b, hh, ww, c = h.shape
    co = w_eps.shape[-1]
    bx = b // 2 if mode == "sd" else b
    rows = block_rows
    while hh % rows:
        rows //= 2
    # shrink the strip until the kernel's VMEM stack fits: the SR-stage
    # (256, 256, 8, 192) shape at rows=8 measured 102.7M vs the 100M scoped
    # limit (compile-time OOM); rows=4 fits with wide margin.
    while rows > 1 and _stack_bytes(
            rows, ww, b, c, co, jnp.dtype(h.dtype).itemsize) > _STACK_BUDGET:
        rows //= 2
    nblk = hh // rows

    ht = jnp.transpose(h, (1, 2, 0, 3))            # (H, W, B, C) bitcast view
    xt = jnp.transpose(x, (1, 2, 0, 3)).astype(jnp.float32)
    wt = _tap_major_weights(w_eps).astype(h.dtype)
    wc = _collapse_matrix(b_eps)
    coef = coefs.astype(jnp.float32).reshape(1, 4)

    # Halo rows come in as two extra 1-row pipelined views of the SAME array
    # with CLAMPED index maps (units of their own block shape, so the 1-row
    # specs index absolute rows) — the kernel zeroes the clamped duplicates
    # at the image edges.
    out = pl.pallas_call(
        functools.partial(_tail_kernel, rows=rows, width=ww,
                          batch=b, nblk=nblk, co=co, mode=mode),
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((1, ww, b, c),
                         lambda i: (jnp.maximum(i * rows - 1, 0), 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, ww, b, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ww, b, c),
                         lambda i: (jnp.minimum(i * rows + rows, hh - 1),
                                    0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, ww, bx, co), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, 9 * co), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * co + 1, co), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((rows, ww, bx, co), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((hh, ww, bx, co), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((rows + 2, ww + 4, b, c), h.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            # the window scratch + fp32 z/acc temporaries exceed XLA's 16M
            # default scoped-vmem stack (same as winograd/flash-attention)
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(ht, ht, ht, xt, mult.astype(jnp.float32), add.astype(jnp.float32),
      wt, wc, coef)
    return jnp.transpose(out, (2, 0, 1, 3))


def ddim_tail_step_ref(h: jnp.ndarray, x: jnp.ndarray, mult: jnp.ndarray,
                       add: jnp.ndarray, w_eps: jnp.ndarray,
                       b_eps: jnp.ndarray, coefs: jnp.ndarray) -> jnp.ndarray:
    """Plain-XLA reference/fallback with the kernel's numerics (fp32 affine +
    SiLU, bf16 GEMM inputs, fp32 accumulation)."""
    y = h.astype(jnp.float32) * mult[:, None, None, :] + add[:, None, None, :]
    xn = (y * jax.nn.sigmoid(y)).astype(h.dtype)
    eps = jax.lax.conv_general_dilated(
        xn, w_eps.astype(h.dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32) + b_eps.astype(jnp.float32)
    sr, srm1, sap, s1map = [coefs[i] for i in range(4)]
    xs_scaled = sr * x.astype(jnp.float32)
    px0 = jnp.clip(xs_scaled - srm1 * eps, -1.0, 1.0)
    eps2 = (xs_scaled - px0) / srm1
    return sap * px0 + s1map * eps2


def sd_cfg_tail_step_ref(h: jnp.ndarray, x: jnp.ndarray, mult: jnp.ndarray,
                         add: jnp.ndarray, w_eps: jnp.ndarray,
                         b_eps: jnp.ndarray, coefs: jnp.ndarray) -> jnp.ndarray:
    """Plain-XLA reference/fallback for the sd mode (CFG halves + linear
    eta=0 DDIM update), kernel numerics."""
    y = h.astype(jnp.float32) * mult[:, None, None, :] + add[:, None, None, :]
    xn = (y * jax.nn.sigmoid(y)).astype(h.dtype)
    eps = jax.lax.conv_general_dilated(
        xn, w_eps.astype(h.dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32) + b_eps.astype(jnp.float32)
    bx = h.shape[0] // 2
    scale, c_x, c_eps = coefs[0], coefs[1], coefs[2]
    u, cnd = eps[:bx], eps[bx:]
    g = u + scale * (cnd - u)
    return c_x * x.astype(jnp.float32) + c_eps * g


def tail_route(h_shape, platform: str) -> bool:
    """Kernel eligibility: TPU, batch a sublane multiple, spatial divisible
    by 2 (block search), C lane-friendly. The SR stage (8, 256, 256, 192)
    qualifies; anything else falls back to the XLA reference path."""
    b, hh, ww, c = h_shape
    return (platform == "tpu" and b % 8 == 0 and hh % 2 == 0
            and c % 8 == 0 and ww >= 8)


def sd_tail_route(h_shape, platform: str) -> bool:
    """sd mode additionally needs the latent half-batch sublane-tiled (the
    guide slices halves on the sublane dim) — i.e. folded batch % 16 == 0."""
    return tail_route(h_shape, platform) and h_shape[0] % 16 == 0
