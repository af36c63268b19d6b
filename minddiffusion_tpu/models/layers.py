"""Shared neural-net building blocks (flax.linen, NHWC, bf16-with-fp32-islands).

TPU-first conventions used across all model families:
  * NHWC layout everywhere — XLA's TPU conv emitter wants channels-last so the
    channel dim lands on the 128-lane axis (the reference is NCHW,
    e.g. stablediffusionv2/ldm/modules/diffusionmodules/openaimodel.py:536-576;
    we deliberately invert this).
  * `param_dtype` is fp32; activations are `dtype` (bf16 by default on TPU).
  * Normalizations (GroupNorm/LayerNorm) compute in fp32 regardless of the
    activation dtype, mirroring the reference's fp32 norm islands
    (stablediffusionv2 ldm/modules/diffusionmodules/util.py:90-96,
    Taichu-GLIDE model/glide_text2im/model/xf.py:26-33).
  * "zero modules" (reference util.py zero_module) become zero-init kernels.
"""
from __future__ import annotations

import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from minddiffusion_tpu.utils.flags import flags

Dtype = Any


def timestep_embedding(timesteps: jnp.ndarray, dim: int, max_period: float = 10000.0) -> jnp.ndarray:
    """Sinusoidal timestep embeddings, fp32.

    Matches the reference layout [cos ‖ sin]? No — the reference emits
    concat([cos, sin]) (stablediffusionv2 util.py:111-131 builds
    concat([Cos(args), Sin(args)])); we keep that exact order so converted
    checkpoints reproduce bit-compatible time embeddings.
    Accepts integer or float timesteps of shape (B,).
    """
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None, :]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


def _gn_groups(channels: int, num_groups: int) -> int:
    """Real model channel counts are multiples of 32; tiny test configs may
    not be — fall back to the largest divisor <= num_groups."""
    groups = num_groups
    while channels % groups:
        groups -= 1
    return groups


def gn_affine_from_sums(s1, s2, n_spatial, scale, bias, num_groups=32,
                        eps=1e-5, emb=None):
    """GroupNorm folded to a per-(batch, channel) affine from precomputed
    per-channel spatial sums (s1, s2): returns (mult, add) with
    GroupNorm(x)*scale + bias == x*mult + add. Same fp32 stats formula as
    flax GroupNorm (tested equal), reduction order aside.

    `emb` (B, C): analytic pre-norm embedding add. The stored tensor is h,
    but the normalized quantity is (h + e): moments shift by
    s1' = s1 + n*e, s2' = s2 + 2*e*s1 + n*e², and the returned affine folds
    e so that silu((h+e-mu')*inv'*gamma + beta) == silu(h*mult + add) —
    the h+e tensor is never materialized (the unfused path pays a full
    bf16 HBM round-trip for it)."""
    c = s1.shape[-1]
    groups = _gn_groups(c, num_groups)
    gs = c // groups
    b = s1.shape[0]
    if emb is not None:
        e = emb.astype(jnp.float32)
        s2 = s2 + 2.0 * e * s1 + n_spatial * e * e
        s1 = s1 + n_spatial * e
    n = n_spatial * gs
    mu_g = s1.reshape(b, groups, gs).sum(-1) / n
    ex2_g = s2.reshape(b, groups, gs).sum(-1) / n
    inv_g = jax.lax.rsqrt(ex2_g - mu_g * mu_g + eps)
    mu_c = jnp.repeat(mu_g, gs, axis=-1)
    inv_c = jnp.repeat(inv_g, gs, axis=-1)
    mult = inv_c * scale[None]
    add = bias[None] - mu_c * mult
    if emb is not None:
        add = add + emb.astype(jnp.float32) * mult
    return mult, add


class GNInner(nn.Module):
    """Mirrors nn.GroupNorm's {scale, bias} params (named GroupNorm_0 by the
    callers, so the param tree is identical whichever path computes)."""

    dim: int

    @nn.compact
    def __call__(self):
        s = self.param("scale", nn.initializers.ones, (self.dim,), jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (self.dim,), jnp.float32)
        return s, b


class GroupNorm32(nn.Module):
    """GroupNorm(32) computed in fp32, output cast back to the input dtype.

    Reference keeps GroupNorm fp32 under fp16 activations (util.py:90-96,
    attention.py Normalize). eps matches per use site.

    The fp32 stat reduces ride the producing conv as a tuple-output
    epilogue (XLA's convert_reduce fusion class), which is effectively free;
    a Pallas channel-sums kernel that isolated them measured a LOSS at every
    scope (r4 A/Bs — retired to benchmarks/research/gn_stats.py, boundary-
    layout lesson in DESIGN.md §13).
    """

    num_groups: int = 32
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        channels = x.shape[-1]
        groups = _gn_groups(channels, self.num_groups)
        # flax computes the statistics in fp32 regardless of `dtype` (verified
        # bit-identical to an explicit fp32 round-trip), so activations can
        # stay bf16 end to end — no materialized fp32 copies.
        return nn.GroupNorm(
            num_groups=groups,
            epsilon=self.eps,
            dtype=x.dtype,
            param_dtype=jnp.float32,
        )(x)


class LayerNormFp32(nn.Module):
    """LayerNorm computed in fp32 (reference xf.py:26-33, attention.py norms)."""

    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # fp32 statistics, activations stay in the input dtype (see GroupNorm32)
        return nn.LayerNorm(epsilon=self.eps, dtype=x.dtype,
                            param_dtype=jnp.float32)(x)


def dense(features: int, dtype: Dtype, use_bias: bool = True, zero_init: bool = False,
          name: Optional[str] = None) -> nn.Dense:
    kernel_init = nn.initializers.zeros if zero_init else nn.initializers.lecun_normal()
    return nn.Dense(
        features,
        use_bias=use_bias,
        dtype=dtype,
        param_dtype=jnp.float32,
        kernel_init=kernel_init,
        name=name,
    )


class Conv3x3Params(nn.Module):
    """Declares WinoConv3x3/nn.Conv's {kernel, bias} without computing —
    for code paths that drive the conv functionally (split-concat resblocks,
    fused upsample+conv, chained merged resblock convs) while keeping the
    checkpoint tree identical."""

    in_ch: int
    out_ch: int
    zero_init: bool = False

    @nn.compact
    def __call__(self):
        init = (nn.initializers.zeros if self.zero_init
                else nn.initializers.lecun_normal())
        k = self.param("kernel", init,
                       (3, 3, self.in_ch, self.out_ch), jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (self.out_ch,),
                       jnp.float32)
        return k, b


def fused_upsample_conv3x3(x: jnp.ndarray, kernel: jnp.ndarray,
                           bias: Optional[jnp.ndarray], dtype: Dtype) -> jnp.ndarray:
    """nearest-2x upsample followed by 3x3 same-pad conv, computed WITHOUT
    materializing the 4x-size intermediate: exact subpixel decomposition into
    four 2x2-kernel convs over the original grid, pixel-shuffled together.

    For output row 2i+a, the 3 kernel taps hit source rows i+floor((a+d-1)/2),
    which collapses to TWO distinct source rows with summed weights:
    a=0 -> {-1: K0, 0: K1+K2}, a=1 -> {0: K0+K1, 1: K2} (same on columns).
    That is 4 MACs per output pixel instead of 9 (a 2.25x FLOP cut on top of
    skipping the upsampled tensor's HBM round-trip), with bit-identical math
    up to fp reassociation. Used by the UNet/VAE Upsample paths.
    """
    b, h, w, c = x.shape
    c_out = kernel.shape[-1]
    k = kernel.astype(jnp.float32)
    row = {0: jnp.stack([k[0], k[1] + k[2]]),        # row offsets (-1, 0)
           1: jnp.stack([k[0] + k[1], k[2]])}        # row offsets (0, +1)
    keff = {}
    for a in (0, 1):
        ra = row[a]                                  # (2, 3, Ci, Co)
        keff[(a, 0)] = jnp.stack([ra[:, 0], ra[:, 1] + ra[:, 2]], axis=1)
        keff[(a, 1)] = jnp.stack([ra[:, 0] + ra[:, 1], ra[:, 2]], axis=1)
    xp = jnp.pad(x.astype(dtype), ((0, 0), (1, 1), (1, 1), (0, 0)))
    phases = []
    for a in (0, 1):
        prow = []
        for bb in (0, 1):
            xs = jax.lax.slice(xp, (0, a, bb, 0), (b, a + h + 1, bb + w + 1, c))
            y = jax.lax.conv_general_dilated(
                xs, keff[(a, bb)].astype(dtype), (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            prow.append(y)
        phases.append(jnp.stack(prow, axis=3))       # (B, H, W, 2, Co)
    y = jnp.stack(phases, axis=2)                    # (B, H, 2, W, 2, Co)
    y = y.reshape(b, 2 * h, 2 * w, c_out)
    if bias is not None:
        y = y + bias.astype(dtype)
    return y


def wino_route(h: int, w: int, c_in: int, c_out: int,
               itemsize: int = 2) -> bool:
    """True when a 3x3 conv at this shape dispatches to the Winograd Pallas
    kernel (backend + measured shape rule + env opt-out). `itemsize` is the
    activation/weight element size the kernel will run at — fp32 callers
    must pass 4 or the VMEM rule under-counts the resident U."""
    from minddiffusion_tpu.ops import winograd

    return (jax.default_backend() == "tpu"
            and winograd.wino_wins(h, w, c_in, c_out, itemsize=itemsize)
            and flags().wino)


def conv3x3_dispatch(x: jnp.ndarray, kernel: jnp.ndarray, bias: Optional[jnp.ndarray],
                     dtype: Dtype, u: Optional[jnp.ndarray] = None,
                     gn: Optional[tuple] = None, merge_out: bool = False,
                     in_dims: Optional[tuple] = None) -> jnp.ndarray:
    """Functional 3x3 same-pad conv with the winograd/XLA shape dispatch used
    by WinoConv3x3 (shared by the split-concat resblock path). `u` is the
    hoisted weight transform (inference only — that path skips the AD
    wrapper, gradients always route through the transform-inside variant).

    `gn` = (mult, add), each (B, C_in) fp32: the GroupNorm+SiLU prologue as a
    per-(batch, channel) affine — the conv input becomes silu(x*mult + add).
    On the winograd inference path the fold runs IN-KERNEL (no normalized
    activation materialized in HBM); every other path applies it elementwise
    first (identical math, fp32 silu).

    `merge_out` / `in_dims`: chained-resblock merged I/O (A-form, see
    ops/winograd). Callers may only pass these when the call is guaranteed
    to take the hoisted-u winograd kernel path (u + gn present, shape routes
    to the kernel) — there is no fallback for a pre-merged input."""
    from minddiffusion_tpu.ops import winograd

    if in_dims is not None:
        h, w = in_dims
        c = x.shape[-1] // 2
    else:
        _, h, w, c = x.shape
    features = kernel.shape[-1]
    use_wino = wino_route(h, w, c, features,
                          itemsize=jnp.dtype(dtype).itemsize)
    x = x.astype(dtype)
    if bias is None:
        bias = jnp.zeros((features,), jnp.float32)
    if use_wino and u is not None:
        if gn is not None:
            return winograd.conv3x3_winograd(x, kernel.astype(dtype), bias,
                                             u=u, gn_mult=gn[0], gn_add=gn[1],
                                             out_merged=merge_out,
                                             in_dims=in_dims)
        assert not merge_out and in_dims is None
        return winograd.conv3x3_winograd(x, kernel.astype(dtype), bias, u=u)
    assert not merge_out and in_dims is None, \
        "merged-chain conv requires the winograd kernel path"
    if gn is not None:
        xf = x.astype(jnp.float32) * gn[0][:, None, None, :] \
            + gn[1][:, None, None, :]
        x = (xf * jax.nn.sigmoid(xf)).astype(dtype)
    if use_wino:
        return winograd.conv3x3_winograd_ad(x, kernel.astype(dtype), bias)
    y = jax.lax.conv_general_dilated(
        x, kernel.astype(dtype), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + bias.astype(dtype)


def hoisted_wino_u(module: nn.Module, name: str, kernel: jnp.ndarray,
                   x: jnp.ndarray, features: int,
                   dtype: Dtype) -> Optional[jnp.ndarray]:
    """Loop-invariant Winograd weight-transform hoisting via the `wino_u`
    collection. Inside a sampler's `lax.scan`, XLA does NOT hoist U = G k G^T
    out of the loop body (~165 ms/batch of per-step transform + layout-copy
    work in the 50-step SD2 program, xprof-measured), so inference pipelines
    run one capture pass with mutable=["wino_u"] — this records U for every
    conv that routes to the Pallas kernel — then feed the captured collection
    back so the scan body reads U as a constant. `kernel` may be a slice of a
    declared param (split-concat resblocks): the capture stores the sliced
    transform, which is exactly why the capture pass (not a param-tree walk)
    is the mechanism. Returns None outside the hoisting regime (training,
    init, CPU)."""
    if module.is_initializing():
        return None
    if module.has_variable("wino_u", name):
        return module.get_variable("wino_u", name)
    if (module.is_mutable_collection("wino_u")
            and wino_route(x.shape[1], x.shape[2], kernel.shape[2], features,
                           itemsize=jnp.dtype(dtype).itemsize)):
        from minddiffusion_tpu.ops.winograd import transform_weights

        u = transform_weights(kernel).astype(dtype)
        module.put_variable("wino_u", name, u)
        return u
    return None


class WinoConv3x3(nn.Module):
    """3x3 stride-1 conv that dispatches to the Winograd F(2x2,3x3) Pallas
    kernel at the shapes where it measured faster than XLA's direct conv
    (ops/winograd.wino_wins), and to nn.Conv-equivalent lax conv otherwise.

    Param tree is identical to nn.Conv ({kernel, bias}), so checkpoints are
    layout-agnostic. Gradients route through an XLA-direct-conv VJP."""

    features: int
    dtype: Dtype = jnp.float32
    zero_init: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 gn: Optional[tuple] = None) -> jnp.ndarray:
        init = (nn.initializers.zeros if self.zero_init
                else nn.initializers.lecun_normal())
        kernel = self.param("kernel", init, (3, 3, x.shape[-1], self.features),
                            jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32)
        u = hoisted_wino_u(self, "u", kernel, x, self.features, self.dtype)
        # output in compute dtype like nn.Conv (a preferred fp32 output
        # doubles the write traffic for no accuracy gain — the MXU
        # accumulator is fp32 either way)
        return conv3x3_dispatch(x, kernel, bias, self.dtype, u=u, gn=gn)


def conv3x3(features: int, dtype: Dtype, zero_init: bool = False, stride: int = 1,
            name: Optional[str] = None) -> nn.Module:
    if stride == 1:
        return WinoConv3x3(features, dtype=dtype, zero_init=zero_init, name=name)
    kernel_init = nn.initializers.zeros if zero_init else nn.initializers.lecun_normal()
    return nn.Conv(
        features,
        kernel_size=(3, 3),
        strides=(stride, stride),
        padding=1,
        dtype=dtype,
        param_dtype=jnp.float32,
        kernel_init=kernel_init,
        name=name,
    )


def conv1x1(features: int, dtype: Dtype, zero_init: bool = False,
            name: Optional[str] = None) -> nn.Conv:
    kernel_init = nn.initializers.zeros if zero_init else nn.initializers.lecun_normal()
    return nn.Conv(
        features,
        kernel_size=(1, 1),
        dtype=dtype,
        param_dtype=jnp.float32,
        kernel_init=kernel_init,
        name=name,
    )


def nearest_upsample_2x(x: jnp.ndarray) -> jnp.ndarray:
    """NHWC nearest-neighbor 2x upsample (reference ResizeNearestNeighbor)."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


def avg_pool_2x(x: jnp.ndarray) -> jnp.ndarray:
    return nn.avg_pool(x, window_shape=(2, 2), strides=(2, 2))
