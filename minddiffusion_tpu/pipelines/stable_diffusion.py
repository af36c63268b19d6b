"""Stable Diffusion pipelines: txt2img / img2img / inpaint as ONE XLA program.

The reference orchestrates these as host loops over per-step device launches
(stablediffusionv2/txt2img.py:248-265 -> plms.py:151-177: ~101 UNet graph
launches per batch, plus separate text-encode and VAE-decode launches). Here
`build_txt2img` returns a single jitted function

    images_uint8 = fn(params, tokens, uncond_tokens, key)

whose trace contains: CLIP encode of the folded [uncond; cond] token batch,
the full `lax.scan` denoising chain with CFG on the batch axis, VAE decode,
and uint8 quantization. One compilation, zero host round-trips, everything
fused by XLA; the spatial self-attention inside runs the Pallas kernel.

Model families (SURVEY.md §2.1-2.2):
  * "sd2": CLIP-H (1024w/23L) + SD2 UNet (head_dim 64, linear-in-transformer),
    PLMS-50 default (reference txt2img.py:101-157).
  * "wukong": zh CLIP-L (768w/12L, QuickGELU) + SD1 UNet (8 heads), DPM-15
    default (wukong scripts/run_txt2img.sh:21-32).
  * "wukong-inpaint": 9-channel hybrid-conditioned UNet
    (wukong configs *_inpaint_inference.yaml, inpaint.py:65-117).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from minddiffusion_tpu.core import cfg as cfg_lib
from minddiffusion_tpu.core import distributions, latents
from minddiffusion_tpu.core.schedules import DiffusionSchedule
from minddiffusion_tpu.models.clip import CLIPTextConfig, CLIPTextEncoder
from minddiffusion_tpu.models.unet import UNetConfig, UNetModel
from minddiffusion_tpu.models.vae import AutoencoderKL, VAEConfig
from minddiffusion_tpu.samplers import ddim, dpm_solver, plms
from minddiffusion_tpu.utils import xla_opts
from minddiffusion_tpu.utils.flags import flags


def create_sd_models(**kwargs) -> "SDModels":
    """Module-level factory for `instantiate_from_config` YAML targets."""
    if "dtype" in kwargs and isinstance(kwargs["dtype"], str):
        kwargs["dtype"] = {"bf16": jnp.bfloat16, "fp32": jnp.float32}[kwargs["dtype"]]
    return SDModels.create(**kwargs)


@dataclasses.dataclass(frozen=True)
class SDModels:
    """Module bundle + schedule for one SD family (no params inside)."""

    unet: UNetModel
    vae: AutoencoderKL
    text_encoder: CLIPTextEncoder
    schedule: DiffusionSchedule
    scale_factor: float = 0.18215

    @property
    def latent_factor(self) -> int:
        """Spatial downsampling of the first stage (8 for the SD VAE)."""
        return 2 ** (len(self.vae.config.ch_mult) - 1)

    @classmethod
    def create(
        cls,
        family: str = "sd2",
        dtype: Any = jnp.bfloat16,
        attn_impl: Optional[str] = None,
        enable_lora: bool = False,
        lora_rank: int = 4,
        lora_alpha: float = 4.0,
        unet_config: Optional[UNetConfig] = None,
        vae_config: Optional[VAEConfig] = None,
        text_config: Optional[CLIPTextConfig] = None,
        timesteps: int = 1000,
        linear_start: float = 0.00085,
        linear_end: float = 0.0120,
    ) -> "SDModels":
        lora = dict(enable_lora=enable_lora, lora_rank=lora_rank, lora_alpha=lora_alpha)
        if unet_config is None:
            if family == "sd2":
                unet_config = UNetConfig.sd2(dtype=dtype, attn_impl=attn_impl, **lora)
            elif family == "wukong":
                unet_config = UNetConfig.sd1(dtype=dtype, attn_impl=attn_impl, **lora)
            elif family == "wukong-inpaint":
                unet_config = UNetConfig.sd1_inpaint(dtype=dtype, attn_impl=attn_impl, **lora)
            else:
                raise ValueError(f"unknown SD family: {family!r}")
        if text_config is None:
            text_config = (
                CLIPTextConfig.sd2_en(dtype=dtype)
                if family == "sd2"
                else CLIPTextConfig.wukong_zh(dtype=dtype)
            )
        if vae_config is None:
            vae_config = VAEConfig(dtype=dtype)
        schedule = DiffusionSchedule.create("linear", timesteps, linear_start, linear_end)
        return cls(
            unet=UNetModel(unet_config),
            vae=AutoencoderKL(vae_config),
            text_encoder=CLIPTextEncoder(text_config),
            schedule=schedule,
        )

    def init_params(self, rng: jax.Array, height: int = 512, width: int = 512,
                    context_length: int = 77) -> dict:
        """Random-init full param set (for tests/benchmarks without a ckpt)."""
        ru, rv, rt = jax.random.split(rng, 3)
        f = self.latent_factor
        h8, w8 = height // f, width // f
        in_ch = self.unet.config.in_channels
        ctx_dim = self.unet.config.context_dim
        return {
            "unet": self.unet.init(
                ru, jnp.zeros((1, h8, w8, in_ch)), jnp.zeros((1,), jnp.int32),
                jnp.zeros((1, context_length, ctx_dim)),
            ),
            "vae": self.vae.init(rv, jnp.zeros((1, 64, 64, 3))),
            "text": self.text_encoder.init(rt, jnp.zeros((1, context_length), jnp.int32)),
        }


def _make_eps_fn(models: SDModels, params, context2b, guidance_scale,
                 concat2b: Optional[jnp.ndarray] = None,
                 class_labels2b: Optional[jnp.ndarray] = None,
                 sample_shape: Optional[Tuple[int, int, int]] = None,
                 cfg_layout: str = "halves"):
    """CFG-wrapped eps model covering every DiffusionWrapper conditioning key
    of the reference (ddpm.py:360-379): crossattn (context2b), concat /
    hybrid (concat2b channel concat, inpaint), adm (class_labels2b added to
    the t-embedding via the UNet label_emb).

    `sample_shape` = (B, h8, w8) of the latents the sampler will feed; when
    given (inference pipelines), loop-invariant work is captured once here,
    OUTSIDE the sampler's scan, and fed back in as scan constants — XLA does
    not hoist it out of the loop body on its own. Captured collections:
      * `xattn_kv`: cross-attention K/V projections of the constant text
        context (models/attention.CrossAttention);
      * `wino_u`: Winograd weight transforms U = G k G^T, per kernel SLICE
        at split-concat resblocks (models/layers.hoisted_wino_u) —
        ~165 ms/batch of per-step transform + layout-copy work otherwise."""

    # CFG-prefix dedup: run the UNet prefix (everything before the first
    # cross-attention) once at batch B instead of twice — numerically
    # identical, measurably cheaper. Inapplicable when the guidance halves
    # differ before cross-attention (channel-concat or class conditioning).
    # cfg_layout: "halves" ([uncond; cond], the reference ordering) or
    # "interleave" (per-sample pairs — shard-local under dp mesh serving;
    # context2b must already be folded in the SAME layout by the caller).
    interleave = cfg_layout == "interleave"
    dedup = (concat2b is None and class_labels2b is None
             and flags().cfg_dedup)
    fold_mode = ("interleave" if interleave else True) if dedup else False

    unet_vars = params["unet"]
    hoist = (sample_shape is not None and flags().hoist
             and (jax.default_backend() == "tpu" or flags().hoist_force))
    if hoist:
        b, h8, w8 = sample_shape
        xb = b if dedup else 2 * b
        base_ch = models.unet.config.in_channels - (
            0 if concat2b is None else concat2b.shape[-1])
        x_d = jnp.zeros((xb, h8, w8, base_ch), jnp.float32)
        if concat2b is not None:
            x_d = jnp.concatenate([x_d, concat2b.astype(x_d.dtype)], axis=-1)
        t_d = jnp.zeros((xb,), jnp.int32)
        # capture pass: only the captured values' data paths stay live; the
        # rest of this forward is dead code XLA eliminates
        _, cap = models.unet.apply(unet_vars, x_d, t_d, context2b,
                                   y=class_labels2b, cfg_fold=fold_mode,
                                   mutable=["xattn_kv", "wino_u"])
        hoisted = {col: vals for col, vals in cap.items()
                   if jax.tree.leaves(vals)}
        unet_vars = {**unet_vars, **hoisted}

    def apply_fn(x2, t2, ctx2):
        if concat2b is not None:
            x2 = jnp.concatenate([x2, concat2b.astype(x2.dtype)], axis=-1)
        return models.unet.apply(unet_vars, x2, t2, ctx2,
                                 y=class_labels2b, cfg_fold=fold_mode)

    return cfg_lib.wrap_model(apply_fn, context2b, guidance_scale, dedup=dedup,
                              interleave=interleave)


def _run_sampler(sampler: str, eps_fn, x_T, schedule, num_steps, key,
                 mask=None, x0=None, t_start_index=None):
    if t_start_index is not None and sampler != "ddim":
        # img2img's mid-chain start is only implemented for DDIM (the
        # reference ships no img2img at all; PLMS multistep history and the
        # DPM solver tables are built for full chains) — refuse rather than
        # silently run the full chain on a partially-noised latent
        raise ValueError(
            f"t_start_index (img2img strength<1) requires sampler='ddim', "
            f"got {sampler!r}")
    if sampler == "dpm_adaptive" and (mask is not None or x0 is not None):
        raise ValueError("dpm_adaptive does not support mask/x0 blending")
    if sampler == "ddim":
        return ddim.sample(eps_fn, x_T, schedule, num_steps=num_steps, key=key,
                           mask=mask, x0=x0, t_start_index=t_start_index)
    if sampler == "plms":
        return plms.sample(eps_fn, x_T, schedule, num_steps=num_steps, key=key,
                           mask=mask, x0=x0)
    if sampler == "dpm":
        return dpm_solver.sample(eps_fn, x_T, schedule, steps=num_steps, key=key,
                                 mask=mask, x0=x0)
    if sampler == "dpm_singlestep":
        return dpm_solver.sample_singlestep(eps_fn, x_T, schedule,
                                            steps=num_steps, key=key,
                                            mask=mask, x0=x0)
    if sampler == "dpm_adaptive":
        # reference `method="adaptive"` (dpm_solver.py:1047-1052); num_steps
        # is ignored — the solver controls its own step size
        return dpm_solver.sample_adaptive(eps_fn, x_T, schedule)
    raise ValueError(f"unknown sampler: {sampler!r}")


class StableDiffusionPipeline:
    """Builds jitted end-to-end generation functions for one SDModels bundle."""

    def __init__(self, models: SDModels):
        self.models = models

    # -- txt2img ----------------------------------------------------------

    def build_txt2img(
        self,
        height: int = 512,
        width: int = 512,
        num_steps: int = 50,
        sampler: str = "plms",
        guidance_scale: float = 9.0,
        batch_size: int = 1,
        mesh=None,
    ) -> Callable:
        """Returns jit(fn)(params, tokens, uncond_tokens, key) -> uint8 images.

        tokens/uncond_tokens: (B, 77) int32. Defaults mirror the reference CLI
        (txt2img.py:101-157: PLMS 50, scale 9.0 for SD2). Pass a
        `jax.sharding.Mesh` to serve one batch data-parallel across chips
        (batch_size must divide the mesh's dp*fsdp extent).
        """
        m = self.models
        h8, w8 = height // m.latent_factor, width // m.latent_factor
        # Mesh serving uses the pair-interleaved CFG layout: every sample's
        # (uncond, cond) rows live on the same dp shard, so the fold/dedup
        # duplications and the guide unfold are all shard-local — the whole
        # sampling program compiles collective-free under pure-dp sharding
        # (tests/test_serving_hlo.py; the halves layout lowered to an
        # all-to-all inside the scan body). Single-chip keeps the reference
        # halves ordering (the tuned program).
        cfg_layout = "interleave" if mesh is not None else "halves"

        def fn(params, tokens, uncond_tokens, key, noise=None):
            # `noise`: optional explicit x_T (B, h8, w8, 4) — serving engines
            # pass per-request noise so a request's image is reproducible from
            # its own seed regardless of how it was batched (serving/engine).
            # None (the default, and every CLI/bench path) keeps the original
            # draw-from-key program.
            tok2 = cfg_lib.fold(uncond_tokens, tokens,
                                interleave=cfg_layout == "interleave")
            ctx2 = m.text_encoder.apply(params["text"], tok2)
            eps_fn = _make_eps_fn(
                m, params, ctx2, guidance_scale,
                sample_shape=(batch_size, h8, w8)
                if sampler in ("ddim", "plms") else None,
                cfg_layout=cfg_layout)
            key, knoise = jax.random.split(key)
            if noise is not None:
                assert noise.shape == (batch_size, h8, w8, 4), (
                    f"noise must be {(batch_size, h8, w8, 4)}, got {noise.shape}")
            x_T = (jax.random.normal(knoise, (batch_size, h8, w8, 4), jnp.float32)
                   if noise is None else noise.astype(jnp.float32))
            z = _run_sampler(sampler, eps_fn, x_T, m.schedule, num_steps, key)
            img = m.vae.apply(params["vae"], latents.unscale_latents(z, m.scale_factor),
                              method=m.vae.decode)
            return latents.unit_range_to_uint8(img)

        if mesh is None:
            return xla_opts.jit(fn)
        # Multi-chip serving: params replicated, request batch split over the
        # mesh's data axes — XLA partitions the whole program (the reference's
        # only scale-out story is running independent processes per chip).
        from jax.sharding import NamedSharding, PartitionSpec as P

        from minddiffusion_tpu.parallel.mesh import batch_sharding

        bsh = batch_sharding(mesh)
        repl = NamedSharding(mesh, P())
        def fn_mesh(params, tokens, uncond_tokens, key):
            # explicit-noise input is a single-chip serving feature; the mesh
            # variant keeps the 4-arg surface so in_shardings stays a full
            # prefix of the call args
            return fn(params, tokens, uncond_tokens, key)

        return xla_opts.jit(
            fn_mesh,
            in_shardings=(repl, bsh, bsh, repl),
            out_shardings=bsh,
        )

    # -- img2img ----------------------------------------------------------

    def build_img2img(
        self,
        height: int = 512,
        width: int = 512,
        num_steps: int = 50,
        strength: float = 0.75,
        sampler: str = "ddim",
        guidance_scale: float = 9.0,
    ) -> Callable:
        """jit(fn)(params, init_image_f32[-1,1], tokens, uncond_tokens, key).

        Encodes the init image, q_samples it to step floor(strength*S) of the
        DDIM subsequence, then denoises from there (ddpm.py img2img
        convention).
        """
        m = self.models
        if not 0.0 < strength <= 1.0:
            raise ValueError(f"strength must be in (0, 1], got {strength}")
        t_enc = int(strength * num_steps)
        if t_enc < 1:
            raise ValueError(
                f"strength={strength} rounds to 0 denoise steps at "
                f"num_steps={num_steps} — raise strength or num_steps")
        tables = ddim.build_tables(m.schedule, num_steps)
        t_at = int(tables["t"][num_steps - t_enc])

        def fn(params, init_image, tokens, uncond_tokens, key):
            b = init_image.shape[0]
            tok2 = jnp.concatenate([uncond_tokens, tokens], axis=0)
            ctx2 = m.text_encoder.apply(params["text"], tok2)
            h8l, w8l = height // m.latent_factor, width // m.latent_factor
            eps_fn = _make_eps_fn(
                m, params, ctx2, guidance_scale,
                sample_shape=(b, h8l, w8l)
                if sampler in ("ddim", "plms") else None)

            key, kenc, knoise = jax.random.split(key, 3)
            moments = m.vae.apply(params["vae"], init_image, method=m.vae.encode)
            z0 = latents.scale_latents(distributions.sample(kenc, moments), m.scale_factor)
            noise = jax.random.normal(knoise, z0.shape, jnp.float32)
            t_vec = jnp.full((b,), t_at, jnp.int32)
            x_mid = m.schedule.q_sample(z0, t_vec, noise)
            z = _run_sampler(sampler, eps_fn, x_mid, m.schedule, num_steps, key,
                             t_start_index=t_enc)
            img = m.vae.apply(params["vae"], latents.unscale_latents(z, m.scale_factor),
                              method=m.vae.decode)
            return latents.unit_range_to_uint8(img)

        return xla_opts.jit(fn)

    # -- inpaint (9-channel hybrid conditioning) ---------------------------

    def build_inpaint(
        self,
        height: int = 512,
        width: int = 512,
        num_steps: int = 50,
        sampler: str = "plms",
        guidance_scale: float = 7.5,
    ) -> Callable:
        """jit(fn)(params, image, mask, tokens, uncond_tokens, key) -> uint8.

        image: (B,H,W,3) fp32 in [-1,1]; mask: (B,H,W,1) fp32, 1 = region to
        REPAINT (reference inpaint.py:39-63 binarizes at 0.5 and builds
        masked_image = image * (mask < 0.5)). The UNet input is
        concat(x_t, resized mask, VAE(masked_image)) = 9 channels, shared by
        the cond and uncond branches (inpaint.py:76-92).
        """
        m = self.models
        assert m.unet.config.in_channels == 9, "inpaint needs the 9-channel UNet"
        h8, w8 = height // m.latent_factor, width // m.latent_factor

        def fn(params, image, mask, tokens, uncond_tokens, key):
            b = image.shape[0]
            mask = (mask >= 0.5).astype(jnp.float32)
            masked_image = image * (1.0 - mask)

            tok2 = jnp.concatenate([uncond_tokens, tokens], axis=0)
            ctx2 = m.text_encoder.apply(params["text"], tok2)

            key, kenc, knoise = jax.random.split(key, 3)
            moments = m.vae.apply(params["vae"], masked_image, method=m.vae.encode)
            z_masked = latents.scale_latents(distributions.sample(kenc, moments),
                                             m.scale_factor)
            mask_lat = jax.image.resize(mask, (b, h8, w8, 1), "nearest")
            c_cat = jnp.concatenate([mask_lat, z_masked], axis=-1)  # (B,h8,w8,5)
            c_cat2 = jnp.concatenate([c_cat, c_cat], axis=0)

            eps_fn = _make_eps_fn(
                m, params, ctx2, guidance_scale, concat2b=c_cat2,
                sample_shape=(b, h8, w8)
                if sampler in ("ddim", "plms") else None)
            x_T = jax.random.normal(knoise, (b, h8, w8, 4), jnp.float32)
            z = _run_sampler(sampler, eps_fn, x_T, m.schedule, num_steps, key)
            img = m.vae.apply(params["vae"], latents.unscale_latents(z, m.scale_factor),
                              method=m.vae.decode)
            return latents.unit_range_to_uint8(img)

        return xla_opts.jit(fn)
