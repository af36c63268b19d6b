"""STATUS: REJECTED (r4a-r4e, e2e-measured at every scope) — retired from
ops/ in r5. SD2 512² DDIM-50 b8 A/Bs vs the 1.941 img/s baseline:
MDT_GN_STATS=all 1.796 (convert_reduce collapsed 958->224 ms and the kernel
itself cost only 66 ms, but the freed convs stayed lane-padding-capped at
141-145 TF/s while apply materializations + affine-prologue restructuring
added ~250 ms); =merged (the 3 dragged sites only) 1.852; module-scope
"stats" −0.13 (standard-layout kernel boundary = pure relayout copies);
module-scope transposed "stats_t" −0.008 (neutral). Lessons kept:
DESIGN.md §13 (Pallas boundary layouts — feed a transposed VIEW matching
the producer's memory order) and models/unet._stat_sums' docstring (the
conv-epilogue stat reduce is effectively free; don't isolate it). The
MDT_GN_STATS flag and the model hooks were removed with the retirement —
running this kernel now means calling channel_sums() directly.

Per-channel spatial moments (s1=Σx, s2=Σx²) as a Pallas streaming kernel.

Why a kernel (r3d/r4a xprof evidence): GroupNorm's fp32 convert+square+reduce
gets fused by XLA INTO the producing convolution as a tuple-output epilogue
(the `convert_reduce_fusion` class — 896 ms @ 136 TF/s avg in the 50-step SD2
program vs 163.6 TF/s for plain conv+add fusions; worst single site 97 ms).
Splitting with an optimization_barrier makes XLA emit the stats as a
standalone reduce at only ~245 GB/s, which costs back what the conv gains
(the r3 GN-barrier experiment measured neutral). A Pallas custom call is
unfusable by construction — the producer conv keeps its fast emission — and
streams the tensor once at HBM roofline with the square on the VPU for free.

The reference computes these same moments inside MindSpore's GroupNorm
(stablediffusionv2/ldm/modules/diffusionmodules/util.py:90-96 keeps the norm
in fp32); this module only changes WHERE the reduction runs, not its math.

Numerics: fp32 accumulation of the (bf16) activations, per channel over the
spatial axes — identical quantities to `jnp.sum(x32, (1, 2))` /
`jnp.sum(x32*x32, (1, 2))` up to fp reassociation of the summation order.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Route to the kernel only when the stats input is big enough that the fused
# conv epilogue drag / slow split-reduce outweighs one kernel dispatch
# (~few us in-program). 2 MiB keeps the SD2 mid-block (16x8x8x1280 = 2.6 MiB
# bf16) and everything larger on the kernel path.
MIN_BYTES = 2 * 1024 * 1024

# Per-grid-step input block budget. Small enough to double-buffer the HBM
# stream comfortably inside the 16 MiB VMEM (block + fp32 upcast + prefetch).
_BLOCK_BYTES = 1 << 20


def _stats_kernel(x_ref, s1_ref, s2_ref):
    """Grid (B, H/BH); x block (1, BH, W, C) -> accumulate (1, 1, C) fp32
    sums (the singleton middle dim satisfies Mosaic's block-shape rule:
    trailing block dims must be (8, 128)-divisible OR equal the array's)."""
    xf = x_ref[0].astype(jnp.float32)            # (BH, W, C)
    p1 = jnp.sum(xf, axis=(0, 1))[None, None]    # (1, 1, C)
    p2 = jnp.sum(xf * xf, axis=(0, 1))[None, None]

    @pl.when(pl.program_id(1) == 0)
    def _():
        s1_ref[...] = p1
        s2_ref[...] = p2

    @pl.when(pl.program_id(1) != 0)
    def _():
        s1_ref[...] += p1
        s2_ref[...] += p2


def _block_rows(h: int, w: int, c: int, itemsize: int) -> int:
    bh = 1
    while (h % (bh * 2) == 0) and (bh * 2 * w * c * itemsize) <= _BLOCK_BYTES:
        bh *= 2
    return bh


@functools.partial(jax.jit, static_argnames=("interpret",))
def channel_sums_pallas(x: jnp.ndarray, interpret: bool = False):
    """(B, H, W, C) -> (s1, s2), each fp32 (B, C). See module docstring."""
    b, h, w, c = x.shape
    bh = _block_rows(h, w, c, jnp.dtype(x.dtype).itemsize)
    out = jax.ShapeDtypeStruct((b, 1, c), jnp.float32)
    s1, s2 = pl.pallas_call(
        _stats_kernel,
        grid=(b, h // bh),
        in_specs=[pl.BlockSpec((1, bh, w, c), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(out, out),
        compiler_params=pltpu.CompilerParams(
            # grid dim 1 accumulates into the same output block: sequential
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(x)
    return s1[:, 0], s2[:, 0]


def _stats_kernel_t(x_ref, s1_ref, s2_ref):
    """Transposed variant: grid (H/bh,); x block (bh, W, B, C) -> (B, C)."""
    xf = x_ref[...].astype(jnp.float32)          # (bh, W, B, C)
    p1 = jnp.sum(xf, axis=(0, 1))                # (B, C)
    p2 = jnp.sum(xf * xf, axis=(0, 1))

    @pl.when(pl.program_id(0) == 0)
    def _():
        s1_ref[...] = p1
        s2_ref[...] = p2

    @pl.when(pl.program_id(0) != 0)
    def _():
        s1_ref[...] += p1
        s2_ref[...] += p2


@functools.partial(jax.jit, static_argnames=("interpret",))
def channel_sums_pallas_t(x: jnp.ndarray, interpret: bool = False):
    """(B, H, W, C) -> (s1, s2) fp32 (B, C), reading x through an
    (H, W, B, C) transposed view.

    Why: XLA:TPU emits the producing convolutions with batch-in-sublanes
    layouts ({3,0,2,1} = memory order H, W, B, C). A Pallas operand must be
    in the default layout OF ITS LOGICAL SHAPE — feeding the (B, H, W, C)
    tensor forces a full relayout copy, while feeding the transposed VIEW
    makes the default layout coincide with the conv's native one, so XLA can
    bitcast instead of copy."""
    xt = jnp.transpose(x, (1, 2, 0, 3))
    h, w, b, c = xt.shape
    bh = 1
    while (h % (bh * 2) == 0) and (bh * 2 * w * b * c
                                   * jnp.dtype(x.dtype).itemsize) <= _BLOCK_BYTES:
        bh *= 2
    out = jax.ShapeDtypeStruct((b, c), jnp.float32)
    s1, s2 = pl.pallas_call(
        _stats_kernel_t,
        grid=(h // bh,),
        in_specs=[pl.BlockSpec((bh, w, b, c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((b, c), lambda i: (0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((b, c), lambda i: (0, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(out, out),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(xt)
    return s1, s2


def channel_sums_ref(x: jnp.ndarray):
    """Reference path: what the model code inlined before (XLA fuses it)."""
    x32 = x.astype(jnp.float32)
    return jnp.sum(x32, axis=(1, 2)), jnp.sum(x32 * x32, axis=(1, 2))


def stats_route(shape, itemsize: int) -> bool:
    """True when a (B, H, W, C) stats input dispatches to the Pallas kernel."""
    if len(shape) != 4:
        return False
    b, h, w, c = shape
    nbytes = b * h * w * c * itemsize
    return (jax.default_backend() == "tpu" and nbytes >= MIN_BYTES
            and h * w >= 64)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def channel_sums(x: jnp.ndarray, transposed: bool = False):
    """Per-channel spatial sums (s1, s2) of a (B, H, W, C) activation, fp32.

    Dispatches to the Pallas streaming kernel on TPU at qualifying shapes
    (keeping GroupNorm stats OUT of the producer conv's fusion), and to the
    plain jnp reduction elsewhere. `transposed=True` reads through the
    (H, W, B, C) view (see channel_sums_pallas_t). Differentiable
    (analytic VJP)."""
    return _channel_sums_impl(x, transposed)


def _channel_sums_impl(x: jnp.ndarray, transposed: bool = False):
    if stats_route(x.shape, jnp.dtype(x.dtype).itemsize):
        if transposed:
            return channel_sums_pallas_t(x)
        return channel_sums_pallas(x)
    return channel_sums_ref(x)


def _channel_sums_fwd(x, transposed):
    return _channel_sums_impl(x, transposed), x


def _channel_sums_bwd(transposed, x, g):
    g1, g2 = g
    dx = (g1[:, None, None, :].astype(jnp.float32)
          + 2.0 * x.astype(jnp.float32) * g2[:, None, None, :].astype(jnp.float32))
    return (dx.astype(x.dtype),)


channel_sums.defvjp(_channel_sums_fwd, _channel_sums_bwd)
