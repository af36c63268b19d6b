"""SD UNet denoiser (flax.linen, NHWC, bf16 compute).

Architecture parity with the reference UNetModel
(stablediffusionv2/ldm/modules/diffusionmodules/openaimodel.py:245-576):
sinusoidal t-embedding -> 2-layer MLP; input conv; per level
`num_res_blocks` ResBlocks (+ SpatialTransformer at attention ds rates);
conv Downsample between levels; middle Res-Attn-Res; mirrored up path with
skip-concat and nearest-2x Upsample+conv; GroupNorm-SiLU-zeroconv head.

TPU inversions vs the reference:
  * NHWC + channels-last skip concat (axis=-1).
  * `remat` flag wires `jax.checkpoint` (flax nn.remat) around each level's
    blocks — the reference plumbs use_checkpoint but MindSpore ignores it
    (openaimodel.py:117,263); here it actually gates rematerialization.
  * attention uses the fused Pallas kernel at spatial lengths (ops/attention).

Configs (v2-inference.yaml:24-38, v1-inference-chinese.yaml:24-37):
SD2: ch 320, mult (1,2,4,4), attn ds (4,2,1), head_dim 64, ctx 1024, linear-in-
transformer. SD1/wukong: heads 8, ctx 768, conv projections.
"""
from __future__ import annotations


from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax import struct

from minddiffusion_tpu.core.cfg import cfg_dup
from minddiffusion_tpu.models.attention import SpatialTransformer
from minddiffusion_tpu.models.layers import (
    Conv3x3Params,
    GNInner,
    GroupNorm32,
    conv3x3_dispatch,
    gn_affine_from_sums,
    hoisted_wino_u,
    wino_route,
    fused_upsample_conv3x3,
    avg_pool_2x,
    conv1x1,
    conv3x3,
    dense,
    nearest_upsample_2x,
    timestep_embedding,
)
from minddiffusion_tpu.ops.winograd import merged_channel_sums, wino_chain_ok
from minddiffusion_tpu.utils.flags import flags

Dtype = Any


@struct.dataclass
class UNetConfig:
    in_channels: int = 4
    model_channels: int = 320
    out_channels: int = 4
    num_res_blocks: int = 2
    attention_resolutions: Tuple[int, ...] = (4, 2, 1)
    channel_mult: Tuple[int, ...] = (1, 2, 4, 4)
    num_heads: int = -1
    num_head_channels: int = -1
    transformer_depth: int = 1
    context_dim: Optional[int] = 1024
    use_linear_in_transformer: bool = False
    use_scale_shift_norm: bool = False
    resblock_updown: bool = False
    # adm (class-label) conditioning: label embedding added to the t-embedding
    # (reference ddpm.py:360-379 'adm' DiffusionWrapper branch +
    # openaimodel.py num_classes/label_emb path)
    num_classes: Optional[int] = None
    dtype: Any = struct.field(pytree_node=False, default=jnp.float32)
    remat: bool = False
    enable_lora: bool = False
    lora_rank: int = 4
    lora_alpha: float = 4.0
    attn_impl: Optional[str] = None

    def head_split(self, ch: int) -> Tuple[int, int]:
        """(num_heads, dim_head) at a given channel width (openaimodel.py:374-383)."""
        if self.num_head_channels == -1:
            return self.num_heads, ch // self.num_heads
        return ch // self.num_head_channels, self.num_head_channels

    @classmethod
    def sd2(cls, **kw) -> "UNetConfig":
        return cls(num_head_channels=64, context_dim=1024,
                   use_linear_in_transformer=True, **kw)

    @classmethod
    def sd1(cls, **kw) -> "UNetConfig":
        return cls(num_heads=8, context_dim=768, **kw)

    @classmethod
    def sd1_inpaint(cls, **kw) -> "UNetConfig":
        # 9-ch input: 4 latent + 4 masked-image latent + 1 mask
        # (wukong-huahua_inpaint_inference.yaml "in_channels: 9").
        return cls(in_channels=9, num_heads=8, context_dim=768, **kw)


class _GN32Params(nn.Module):
    """Declares GroupNorm32's exact param tree (<name>/GroupNorm_0/...)."""

    dim: int

    @nn.compact
    def __call__(self):
        return GNInner(self.dim, name="GroupNorm_0")()


class _Conv1x1Params(nn.Module):
    """Declares nn.Conv(1x1)'s {kernel, bias} without computing."""

    in_ch: int
    out_ch: int

    @nn.compact
    def __call__(self):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (1, 1, self.in_ch, self.out_ch), jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (self.out_ch,),
                       jnp.float32)
        return k, b


def _gn_affine(x, scale, bias, num_groups=32, eps=1e-5):
    """GroupNorm folded to a per-(batch, channel) affine: returns (mult, add)
    with GroupNorm(x)*scale + bias == x*mult + add. Same fp32 stats formula
    as _split_group_norm_silu (tested equal to flax GroupNorm). Feeds the
    winograd kernel's fused GN+SiLU prologue (layers.conv3x3_dispatch gn=),
    which skips materializing the normalized activation in HBM."""
    s1, s2 = _stat_sums(x)
    return gn_affine_from_sums(
        s1, s2, x.shape[1] * x.shape[2], scale, bias, num_groups, eps)


def _stat_sums(x):
    """Per-channel fp32 spatial sums (s1, s2) for GroupNorm statistics,
    as plain jnp reductions: XLA fuses them into the producing conv as a
    tuple-output epilogue, which is effectively FREE (VPU-overlapped). A
    Pallas streaming stats kernel that made the reduces unfusable was
    measured a LOSS at every scope (r4: blanket 1.796, dragged-sites-only
    1.852, module-scope transposed −0.008 vs the 1.941 baseline — the freed
    convs stay lane-padding-capped while the kernel pass + apply
    materializations cost real time); it is retired to
    benchmarks/research/gn_stats.py."""
    x32 = x.astype(jnp.float32)
    return jnp.sum(x32, axis=(1, 2)), jnp.sum(x32 * x32, axis=(1, 2))


def _split_gn_affine(parts, scale, bias, num_groups=32, eps=1e-5):
    """_gn_affine over the channel-concat of `parts` WITHOUT materializing the
    concat (split-concat resblocks): group moments from per-part partial
    sums, affine returned full-width for per-part slicing."""
    stats = [_stat_sums(p) for p in parts]
    s1 = jnp.concatenate([s for s, _ in stats], axis=-1)
    s2 = jnp.concatenate([q for _, q in stats], axis=-1)
    return gn_affine_from_sums(
        s1, s2, parts[0].shape[1] * parts[0].shape[2], scale, bias,
        num_groups, eps)


def _split_group_norm_silu(parts, scale, bias, num_groups=32, eps=1e-5):
    """GroupNorm+SiLU over the channel-concat of `parts` WITHOUT materializing
    the concat: group moments come from per-part per-channel partial sums
    (straddling groups combine partials exactly), then each part normalizes
    with its slice of the affine params. Returns the normalized parts."""
    c = sum(p.shape[-1] for p in parts)
    gs = c // num_groups
    stats = [_stat_sums(p) for p in parts]
    s1 = jnp.concatenate([s for s, _ in stats], axis=-1)       # (B, C)
    s2 = jnp.concatenate([q for _, q in stats], axis=-1)
    n = parts[0].shape[1] * parts[0].shape[2] * gs
    b = s1.shape[0]
    mu_g = s1.reshape(b, num_groups, gs).sum(-1) / n           # (B, G)
    ex2_g = s2.reshape(b, num_groups, gs).sum(-1) / n
    inv_g = jax.lax.rsqrt(ex2_g - mu_g * mu_g + eps)
    mu_c = jnp.repeat(mu_g, gs, axis=-1)                       # (B, C)
    inv_c = jnp.repeat(inv_g, gs, axis=-1)
    out, off = [], 0
    for p in parts:
        cw = p.shape[-1]
        sl = slice(off, off + cw)
        norm = ((p.astype(jnp.float32) - mu_c[:, None, None, sl])
                * inv_c[:, None, None, sl] * scale[sl] + bias[sl])
        out.append(nn.silu(norm).astype(p.dtype))
        off += cw
    return out


class ResBlock(nn.Module):
    """GN-SiLU-conv / +t-emb / GN-SiLU-zeroconv with learned skip if needed.

    `skip`: optional second input whose channel-concat with `x` is the
    reference's up-path input (openaimodel.py cat+ResBlock). When given, the
    concat is NEVER materialized: GroupNorm moments combine per-part partial
    sums and conv_in/skip-1x1 split their kernels on the input-channel axis
    (a conv over a concat is the sum of convs over the parts). Param tree is
    identical either way."""

    out_channels: int
    dtype: Dtype = jnp.float32
    use_scale_shift_norm: bool = False
    up: bool = False
    down: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, emb: jnp.ndarray,
                 skip: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        if skip is not None:
            cx, cs = x.shape[-1], skip.shape[-1]
            esz_ = jnp.dtype(self.dtype).itemsize
            if (flags().merge_aligned
                    and (cx % 128 or cs % 128) and (cx + cs) % 128 == 0
                    and min(cx, cs) >= 256
                    and not wino_route(x.shape[1], x.shape[2], cx + cs,
                                       self.out_channels, itemsize=esz_)):
                # ds1 up-resblocks: the 320-ch halves are lane-MISaligned
                # (pad to 384 on K and N — convert_reduce sites at 122T)
                # but their 640-wide concat IS aligned. Materialize the
                # concat once (the barrier keeps XLA from fusing it into
                # the conv and re-reading operands per K-panel) and run the
                # full-width conv at its higher lane cap.
                # SHIPPED DEFAULT (r3i, same-session 3-run A/B pairs:
                # 1.9399 vs 1.9230 and 1.9427 vs 1.923 img/s SD2 512² b8).
                # min(cx,cs)>=256 pins the measured shape class (SD ds1
                # 320+320); GLIDE's 192+192 tiers stay on the split path,
                # which benched 1.999-2.005 img/s. MDT_MERGE_ALIGNED=0
                # opts out.
                # r4e REJECTED extension: also merging low-K-pad-waste sums
                # (the 960-ch up_0_0, 6.7% pad) measured 1.9155 vs the
                # 1.941-1.943 anchor — the materialized 126 MB concat +
                # barrier costs more than the 122 TF/s split mega-fusion it
                # replaces. The gate stays exact-aligned.
                x = jax.lax.optimization_barrier(
                    jnp.concatenate([x, skip], axis=-1))
            else:
                return self._call_split(x, skip, emb)
        in_ch = x.shape[-1]
        # GN+SiLU folded into the winograd conv as an in-kernel affine
        # prologue (no normalized activation materialized in HBM) wherever
        # the conv routes to the kernel; the module path otherwise.
        esz = jnp.dtype(self.dtype).itemsize
        fuse_in = (not self.up and not self.down
                   and wino_route(x.shape[1], x.shape[2], in_ch,
                                  self.out_channels, itemsize=esz))
        chain = (fuse_in
                 and wino_route(x.shape[1], x.shape[2], in_ch,
                                self.out_channels, itemsize=esz)
                 and wino_route(x.shape[1], x.shape[2], self.out_channels,
                                self.out_channels, itemsize=esz)
                 and wino_chain_ok(x.shape[1], x.shape[2], self.out_channels))
        h_m = None
        if fuse_in:
            gs_, gb_ = _GN32Params(in_ch, name="norm_in")()
            ga = _gn_affine(x, gs_, gb_)
            if chain:
                # merged conv_in -> conv_out chain: conv_in emits winograd
                # A-form, which conv_out consumes directly — no un-merge,
                # re-pad, or re-merge HBM passes between the two convs
                # (~3 formatting passes per resblock otherwise)
                k_in, b_in = Conv3x3Params(in_ch, self.out_channels,
                                           name="conv_in")()
                u_in = hoisted_wino_u(self, "conv_in_u", k_in, x,
                                      self.out_channels, self.dtype)
                if u_in is not None:
                    h_m = conv3x3_dispatch(x, k_in, b_in, self.dtype, u=u_in,
                                           gn=ga, merge_out=True)
                else:
                    h = conv3x3_dispatch(x, k_in, b_in, self.dtype, gn=ga)
            else:
                h = conv3x3(self.out_channels, self.dtype, name="conv_in")(
                    x, gn=ga)
        else:
            h = GroupNorm32(name="norm_in")(x)
            h = nn.silu(h)
            if self.up:
                h = nearest_upsample_2x(h)
                x = nearest_upsample_2x(x)
            elif self.down:
                h = avg_pool_2x(h)
                x = avg_pool_2x(x)
            h = conv3x3(self.out_channels, self.dtype, name="conv_in")(h)

        h = self._emb_norm_conv_out(h_m if h_m is not None else h,
                                    h_m is not None, emb,
                                    x.shape[1], x.shape[2])

        if in_ch != self.out_channels:
            x = conv1x1(self.out_channels, self.dtype, name="skip")(x)
        return x + h

    def _emb_out(self, emb, width: int) -> jnp.ndarray:
        """The per-resblock t-embedding projection. (A tabulated-over-the-
        schedule variant was measured e2e NEUTRAL in r3 — the ~22 tiny GEMMs
        per step fully overlap with surrounding compute — and was deleted;
        see ROADMAP "Tried and rejected".)"""
        return dense(width, self.dtype, name="emb_proj")(nn.silu(emb))

    def _emb_norm_conv_out(self, h, merged: bool, emb: jnp.ndarray,
                           hh: int, ww: int) -> jnp.ndarray:
        """Shared t-emb + norm_out + conv_out tail (__call__ and the split
        path). `merged`: h is the conv_in winograd A-form — GN moments come
        from merged_channel_sums, the embedding add is folded analytically
        into the affine (never materialized), and conv_out reads the merged
        form in place (ops/winograd in_dims path)."""
        co = self.out_channels
        emb_out = self._emb_out(emb, 2 * co if self.use_scale_shift_norm else co)
        if merged:
            s1, s2 = merged_channel_sums(h, co)
            gs2, gb2 = _GN32Params(co, name="norm_out")()
            k_out, b_out = Conv3x3Params(co, co, zero_init=True,
                                         name="conv_out")()
            u_out = hoisted_wino_u(self, "conv_out_u", k_out,
                                   jnp.zeros((1, hh, ww, 1)), co, self.dtype)
            assert u_out is not None, \
                "merged chain requires the hoisted-u capture regime"
            n_sp = hh * ww
            if self.use_scale_shift_norm:
                scale, shift = jnp.split(emb_out, 2, axis=-1)
                m0, a0 = gn_affine_from_sums(s1, s2, n_sp, gs2, gb2)
                s_ = 1.0 + scale.astype(jnp.float32)
                gn_oa = (m0 * s_, a0 * s_ + shift.astype(jnp.float32))
            else:
                gn_oa = gn_affine_from_sums(s1, s2, n_sp, gs2, gb2,
                                             emb=emb_out)
            return conv3x3_dispatch(h, k_out, b_out, self.dtype, u=u_out,
                                    gn=gn_oa, in_dims=(hh, ww))

        emb_out = emb_out[:, None, None, :]
        esz_ = jnp.dtype(self.dtype).itemsize
        fuse_out = wino_route(hh, ww, co, co, itemsize=esz_)
        if self.use_scale_shift_norm:
            scale, shift = jnp.split(emb_out, 2, axis=-1)
            if fuse_out:
                gs2, gb2 = _GN32Params(co, name="norm_out")()
                m0, a0 = _gn_affine(h, gs2, gb2)
                s_ = 1.0 + scale[:, 0, 0, :].astype(jnp.float32)
                sh_ = shift[:, 0, 0, :].astype(jnp.float32)
                h = conv3x3(co, self.dtype, zero_init=True,
                            name="conv_out")(h, gn=(m0 * s_, a0 * s_ + sh_))
            else:
                h = GroupNorm32(name="norm_out")(h) * (1.0 + scale) + shift
                h = nn.silu(h)
                h = conv3x3(co, self.dtype, zero_init=True,
                            name="conv_out")(h)
        else:
            if fuse_out:
                # analytic pre-norm emb fold (see gn_affine_from_sums emb=):
                # the h+emb tensor is never formed; the affine absorbs it
                gs2, gb2 = _GN32Params(co, name="norm_out")()
                s1, s2 = _stat_sums(h)
                gn_oa = gn_affine_from_sums(s1, s2, hh * ww, gs2, gb2,
                                            emb=emb_out[:, 0, 0, :])
                h = conv3x3(co, self.dtype, zero_init=True,
                            name="conv_out")(h, gn=gn_oa)
            else:
                h = h + emb_out
                h = GroupNorm32(name="norm_out")(h)
                h = nn.silu(h)
                h = conv3x3(co, self.dtype, zero_init=True,
                            name="conv_out")(h)
        return h

    def _call_split(self, x: jnp.ndarray, skip: jnp.ndarray,
                    emb: jnp.ndarray) -> jnp.ndarray:
        """Concat-free up-path body: numerically equal to
        __call__(concat([x, skip], -1), emb) with an identical param tree."""
        cx = x.shape[-1]
        in_ch = cx + skip.shape[-1]
        gn_scale, gn_bias = _GN32Params(in_ch, name="norm_in")()
        groups = 32
        while in_ch % groups:
            groups -= 1
        esz = jnp.dtype(self.dtype).itemsize
        fuse_in = (not self.up and not self.down
                   and (wino_route(x.shape[1], x.shape[2], cx,
                                   self.out_channels, itemsize=esz)
                        or wino_route(x.shape[1], x.shape[2], skip.shape[-1],
                                      self.out_channels, itemsize=esz)))
        if fuse_in:
            # combined-stats GN folded to per-half affines; the winograd
            # halves take it as the in-kernel prologue, a non-wino half
            # applies it elementwise (identical math)
            mult, add = _split_gn_affine([x, skip], gn_scale, gn_bias,
                                         num_groups=groups)
            hx, hs = x, skip
            gn0 = (mult[:, :cx], add[:, :cx])
            gn1 = (mult[:, cx:], add[:, cx:])
        else:
            hx, hs = _split_group_norm_silu([x, skip], gn_scale, gn_bias,
                                            num_groups=groups)
            gn0 = gn1 = None
            if self.up:
                hx, hs = nearest_upsample_2x(hx), nearest_upsample_2x(hs)
                x, skip = nearest_upsample_2x(x), nearest_upsample_2x(skip)
            elif self.down:
                hx, hs = avg_pool_2x(hx), avg_pool_2x(hs)
                x, skip = avg_pool_2x(x), avg_pool_2x(skip)
        k_in, b_in = Conv3x3Params(in_ch, self.out_channels,
                                   name="conv_in")()
        # per-half hoisted winograd transforms: the capture pass stores U of
        # each kernel SLICE, so nothing is sliced inside the sampler scan
        # (a per-step (16,1280,1280) slice-copy otherwise, xprof-measured)
        u0 = hoisted_wino_u(self, "conv_in_u0", k_in[:, :, :cx], hx,
                            self.out_channels, self.dtype)
        u1 = hoisted_wino_u(self, "conv_in_u1", k_in[:, :, cx:], hs,
                            self.out_channels, self.dtype)
        # merged chain needs BOTH halves on the kernel path (their A-form
        # outputs sum elementwise into one merged tensor for conv_out)
        chain = (fuse_in and u0 is not None and u1 is not None
                 and gn0 is not None and gn1 is not None
                 and wino_route(x.shape[1], x.shape[2], cx,
                                self.out_channels, itemsize=esz)
                 and wino_route(x.shape[1], x.shape[2], skip.shape[-1],
                                self.out_channels, itemsize=esz)
                 and wino_route(x.shape[1], x.shape[2], self.out_channels,
                                self.out_channels, itemsize=esz)
                 and wino_chain_ok(x.shape[1], x.shape[2],
                                   self.out_channels))
        if chain:
            h_m = (conv3x3_dispatch(hx, k_in[:, :, :cx], b_in, self.dtype,
                                    u=u0, gn=gn0, merge_out=True)
                   + conv3x3_dispatch(hs, k_in[:, :, cx:], None, self.dtype,
                                      u=u1, gn=gn1, merge_out=True))
            h = self._emb_norm_conv_out(h_m, True, emb,
                                        x.shape[1], x.shape[2])
            k_sk, b_sk = _Conv1x1Params(in_ch, self.out_channels,
                                        name="skip")()
            res = (jnp.einsum("bhwc,cd->bhwd", x.astype(self.dtype),
                              k_sk[0, 0, :cx].astype(self.dtype))
                   + jnp.einsum("bhwc,cd->bhwd", skip.astype(self.dtype),
                                k_sk[0, 0, cx:].astype(self.dtype))
                   + b_sk.astype(self.dtype))
            return res + h
        h = (conv3x3_dispatch(hx, k_in[:, :, :cx], b_in, self.dtype, u=u0,
                              gn=gn0)
             + conv3x3_dispatch(hs, k_in[:, :, cx:], None, self.dtype, u=u1,
                                gn=gn1))

        emb_out = self._emb_out(
            emb,
            2 * self.out_channels if self.use_scale_shift_norm
            else self.out_channels)
        emb_out = emb_out[:, None, None, :]
        esz2 = jnp.dtype(self.dtype).itemsize
        fuse_out = wino_route(h.shape[1], h.shape[2], self.out_channels,
                              self.out_channels, itemsize=esz2)
        if self.use_scale_shift_norm:
            scale, shift = jnp.split(emb_out, 2, axis=-1)
            if fuse_out:
                gs2, gb2 = _GN32Params(self.out_channels, name="norm_out")()
                m0, a0 = _gn_affine(h, gs2, gb2)
                s_ = 1.0 + scale[:, 0, 0, :].astype(jnp.float32)
                sh_ = shift[:, 0, 0, :].astype(jnp.float32)
                h = conv3x3(self.out_channels, self.dtype, zero_init=True,
                            name="conv_out")(h, gn=(m0 * s_, a0 * s_ + sh_))
            else:
                h = GroupNorm32(name="norm_out")(h) * (1.0 + scale) + shift
                h = nn.silu(h)
                h = conv3x3(self.out_channels, self.dtype, zero_init=True,
                            name="conv_out")(h)
        else:
            if fuse_out:
                gs2, gb2 = _GN32Params(self.out_channels, name="norm_out")()
                s1, s2 = _stat_sums(h)
                gn_oa = gn_affine_from_sums(
                    s1, s2, h.shape[1] * h.shape[2], gs2, gb2,
                    emb=emb_out[:, 0, 0, :])
                h = conv3x3(self.out_channels, self.dtype, zero_init=True,
                            name="conv_out")(h, gn=gn_oa)
            else:
                h = h + emb_out
                h = GroupNorm32(name="norm_out")(h)
                h = nn.silu(h)
                h = conv3x3(self.out_channels, self.dtype, zero_init=True,
                            name="conv_out")(h)

        if in_ch != self.out_channels:
            k_sk, b_sk = _Conv1x1Params(in_ch, self.out_channels,
                                        name="skip")()
            res = (jnp.einsum("bhwc,cd->bhwd", x.astype(self.dtype),
                              k_sk[0, 0, :cx].astype(self.dtype))
                   + jnp.einsum("bhwc,cd->bhwd", skip.astype(self.dtype),
                                k_sk[0, 0, cx:].astype(self.dtype))
                   + b_sk.astype(self.dtype))
        else:
            raise ValueError("split resblock expects a channel-changing skip")
        return res + h


class Downsample(nn.Module):
    out_channels: int
    dtype: Dtype = jnp.float32
    use_conv: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.use_conv:
            return conv3x3(self.out_channels, self.dtype, stride=2, name="conv")(x)
        return avg_pool_2x(x)


class Upsample(nn.Module):
    out_channels: int
    dtype: Dtype = jnp.float32
    use_conv: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.use_conv and flags().fused_up:
            # subpixel-decomposed upsample+conv: 4 MACs/output instead of 9,
            # no 4x intermediate (layers.fused_upsample_conv3x3)
            k, b = Conv3x3Params(x.shape[-1], self.out_channels,
                                 name="conv")()
            return fused_upsample_conv3x3(x, k, b, self.dtype)
        x = nearest_upsample_2x(x)
        if self.use_conv:
            x = conv3x3(self.out_channels, self.dtype, name="conv")(x)
        return x


class UNetModel(nn.Module):
    """The SD denoiser. x: (B, H, W, C) latents; t: (B,); context: (B, L, ctx)."""

    config: UNetConfig

    def _spatial_transformer(self, ch: int, name: str) -> SpatialTransformer:
        cfg = self.config
        heads, dim_head = cfg.head_split(ch)
        return SpatialTransformer(
            in_channels=ch, heads=heads, dim_head=dim_head,
            depth=cfg.transformer_depth, context_dim=cfg.context_dim,
            use_linear=cfg.use_linear_in_transformer, dtype=cfg.dtype,
            enable_lora=cfg.enable_lora, lora_rank=cfg.lora_rank,
            lora_alpha=cfg.lora_alpha, attn_impl=cfg.attn_impl, name=name,
        )

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        timesteps: jnp.ndarray,
        context: Optional[jnp.ndarray] = None,
        y: Optional[jnp.ndarray] = None,
        cfg_fold=False,
    ) -> jnp.ndarray:
        """cfg_fold (False | True | "interleave"): classifier-free-guidance
        dedup; the string value switches the in-network duplications to the
        shard-local pair layout (core.cfg). `x`/`timesteps` come
        in at batch B while `context` is the [uncond; cond] fold at 2B; the
        network runs ONCE at B until the first cross-attention (where the two
        guidance halves first differ), then duplicates activations to 2B.
        Output batch is 2B, numerically identical to applying the model to
        [x; x] — the prefix (in_conv, first resblock, first LN/proj/self-attn)
        is simply not computed twice. Requires a context and at least one
        spatial transformer; class labels (y) are per-half, so adm models
        cannot fold."""
        cfg = self.config
        time_embed_dim = cfg.model_channels * 4
        if cfg_fold:
            if context is None:
                raise ValueError("cfg_fold requires cross-attention context")
            if y is not None:
                raise ValueError("cfg_fold is incompatible with class labels")

        t_emb = timestep_embedding(timesteps, cfg.model_channels)
        te0 = dense(time_embed_dim, cfg.dtype, name="time_embed_0")
        te2 = dense(time_embed_dim, cfg.dtype, name="time_embed_2")
        emb = te2(nn.silu(te0(t_emb.astype(cfg.dtype))))
        if cfg.num_classes is not None:
            # 'adm' class conditioning (openaimodel.py label_emb): y (B,) int
            if y is None:
                raise ValueError("num_classes set but no class labels given")
            emb = emb + nn.Embed(
                cfg.num_classes, time_embed_dim, dtype=cfg.dtype,
                param_dtype=jnp.float32, name="label_emb")(y)

        h = x.astype(cfg.dtype)
        if context is not None:
            context = context.astype(cfg.dtype)

        res_block = nn.remat(ResBlock) if cfg.remat else ResBlock

        # resblocks read `emb` late through this closure: the CFG fold below
        # may widen it from B to 2B after the first cross-attention
        epack = lambda: emb  # noqa: E731

        pending_fold = cfg_fold

        def transformer(h, ch, name):
            nonlocal pending_fold, emb
            h = self._spatial_transformer(ch, name)(h, context,
                                                    cfg_fold=pending_fold)
            if pending_fold:
                if emb.shape[0] > 1:
                    # batch-1 emb (uniform sampler timestep) broadcasts to
                    # either fold half as-is
                    emb = cfg_dup(emb, cfg_fold)
                pending_fold = False
            return h

        hs = []
        h = conv3x3(cfg.model_channels, cfg.dtype, name="in_conv")(h)
        hs.append(h)
        ch = cfg.model_channels
        ds = 1
        # --- down path ---
        for level, mult in enumerate(cfg.channel_mult):
            for i in range(cfg.num_res_blocks):
                ch = mult * cfg.model_channels
                h = res_block(out_channels=ch, dtype=cfg.dtype,
                              use_scale_shift_norm=cfg.use_scale_shift_norm,
                              name=f"down_{level}_{i}_res")(h, epack())
                if ds in cfg.attention_resolutions:
                    h = transformer(h, ch, f"down_{level}_{i}_attn")
                hs.append(h)
            if level != len(cfg.channel_mult) - 1:
                if cfg.resblock_updown:
                    h = res_block(out_channels=ch, dtype=cfg.dtype,
                                  use_scale_shift_norm=cfg.use_scale_shift_norm,
                                  down=True, name=f"down_{level}_ds")(h, epack())
                else:
                    h = Downsample(ch, cfg.dtype, name=f"down_{level}_ds")(h)
                hs.append(h)
                ds *= 2

        # --- middle ---
        h = res_block(out_channels=ch, dtype=cfg.dtype,
                      use_scale_shift_norm=cfg.use_scale_shift_norm,
                      name="mid_res1")(h, epack())
        h = transformer(h, ch, "mid_attn")
        h = res_block(out_channels=ch, dtype=cfg.dtype,
                      use_scale_shift_norm=cfg.use_scale_shift_norm,
                      name="mid_res2")(h, epack())
        if pending_fold:
            raise ValueError("cfg_fold requires at least one spatial transformer")

        # --- up path ---
        split_concat = flags().split_concat
        for level, mult in reversed(list(enumerate(cfg.channel_mult))):
            for i in range(cfg.num_res_blocks + 1):
                skip = hs.pop()
                if skip.shape[0] != h.shape[0]:
                    # pre-fold skip (batch B) meeting a folded h (2B)
                    skip = cfg_dup(skip, cfg_fold)
                ch = mult * cfg.model_channels
                blk = res_block(out_channels=ch, dtype=cfg.dtype,
                                use_scale_shift_norm=cfg.use_scale_shift_norm,
                                name=f"up_{level}_{i}_res")
                if split_concat:
                    h = blk(h, epack(), skip)
                else:
                    h = blk(jnp.concatenate([h, skip], axis=-1), epack())
                if ds in cfg.attention_resolutions:
                    h = transformer(h, ch, f"up_{level}_{i}_attn")
                if level and i == cfg.num_res_blocks:
                    if cfg.resblock_updown:
                        h = res_block(out_channels=ch, dtype=cfg.dtype,
                                      use_scale_shift_norm=cfg.use_scale_shift_norm,
                                      up=True, name=f"up_{level}_us")(h, epack())
                    else:
                        h = Upsample(ch, cfg.dtype, name=f"up_{level}_us")(h)
                    ds //= 2

        h = GroupNorm32(name="out_norm")(h)
        h = nn.silu(h)
        h = conv3x3(cfg.out_channels, cfg.dtype, zero_init=True, name="out_conv")(h)
        return h.astype(jnp.float32)
