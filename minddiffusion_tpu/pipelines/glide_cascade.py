"""Taichu-GLIDE cascade: 64px guided base -> 256px DDIM super-res -> 1024px SRGAN.

Reference flow (Taichu-GLIDE/src/txt2img.py:78-158, main_funcs.py:21-69):
  * base: 60 respaced ancestral steps over a squaredcos_cap_v2 schedule with
    classifier-free guidance where the UNCOND branch uses RANDOM TOKENS
    (main_funcs.py:36-38), fold order [cond; uncond] and CFG
    uncond + s*(cond - uncond) with the variance taken from the cond half
    (guider.py:73-86).
  * super-res: DDIM over "fast27" respacing of a linear schedule, x_T scaled
    by upsample_temp=0.997 (main_funcs.py:54-58), low_res input run through a
    uint8 quantization round-trip (gaussian_diffusion.py:307-313), no CFG.
  * SRGAN x4 on the [-1,1] samples, fp32 (src/txt2img.py:129).

TPU inversions: each diffusion stage is one lax.scan XLA program; the xf text
transformer runs ONCE per stage (the reference re-runs it inside all 87 UNet
calls). Random uncond tokens default to one draw per generation (fast path);
`build_generate(uncond_mode="per_step")` restores the reference's per-step
re-draw exactly (guider.py:36-50) by folding the uncond xf back into the scan
— the documented PARITY.md divergence is now opt-out.
"""
from __future__ import annotations

import os

import dataclasses
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp

from minddiffusion_tpu.core.latents import unit_range_to_uint8
from minddiffusion_tpu.core.schedules import (
    DiffusionSchedule,
    make_beta_schedule,
    respace_schedule,
    space_timesteps,
)
from minddiffusion_tpu.models.glide import (
    GlideUNetConfig,
    SuperResText2ImUNet,
    Text2ImUNet,
    XfConfig,
)
from minddiffusion_tpu.models.srgan import SRGANGenerator
from minddiffusion_tpu.samplers import ancestral
from minddiffusion_tpu.utils import xla_opts
from minddiffusion_tpu.utils.flags import flags


def create_glide_models(**kwargs) -> "GlideModels":
    """Module-level factory for `instantiate_from_config` YAML targets."""
    if "dtype" in kwargs and isinstance(kwargs["dtype"], str):
        kwargs["dtype"] = {"bf16": jnp.bfloat16, "fp32": jnp.float32}[kwargs["dtype"]]
    return GlideModels.create(**kwargs)


def quantize_roundtrip(x: jnp.ndarray) -> jnp.ndarray:
    """uint8 round-trip the super-res conditioning (gaussian_diffusion.py:307-313)."""
    return jnp.round((x + 1.0) * 127.5) / 127.5 - 1.0


@dataclasses.dataclass(frozen=True)
class GlideModels:
    base: Text2ImUNet
    super_res: SuperResText2ImUNet
    srgan: Optional[SRGANGenerator]
    base_schedule: DiffusionSchedule    # respaced (e.g. "60") squaredcos
    sr_schedule: DiffusionSchedule      # respaced "fast27" linear

    @classmethod
    def create(
        cls,
        dtype: Any = jnp.bfloat16,
        base_respacing: str = "60",
        sr_respacing: str = "fast27",
        diffusion_steps: int = 1000,
        with_srgan: bool = True,
        base_unet: Optional[GlideUNetConfig] = None,
        sr_unet: Optional[GlideUNetConfig] = None,
        xf: Optional[XfConfig] = None,
        attn_impl: Optional[str] = None,
    ) -> "GlideModels":
        """Defaults mirror default_options.py:19-148 (base 64px / upsample 256px)."""
        base_unet = base_unet or GlideUNetConfig.base_64(dtype=dtype, attn_impl=attn_impl)
        sr_unet = sr_unet or GlideUNetConfig.upsample_256(dtype=dtype, attn_impl=attn_impl)
        xf = xf or XfConfig(dtype=dtype, debug_tokens=bool(
            os.environ.get("MDT_DEBUG_TOKENS")))
        base_betas = make_beta_schedule("squaredcos_cap_v2", diffusion_steps)
        sr_betas = make_beta_schedule("linear_plain", diffusion_steps)
        return cls(
            base=Text2ImUNet(base_unet, xf),
            super_res=SuperResText2ImUNet(sr_unet, xf),
            srgan=SRGANGenerator(upscale_factor=4) if with_srgan else None,
            base_schedule=respace_schedule(
                base_betas, space_timesteps(diffusion_steps, base_respacing)),
            sr_schedule=respace_schedule(
                sr_betas, space_timesteps(diffusion_steps, sr_respacing)),
        )

    def init_params(self, rng: jax.Array, base_size: int = 64, sr_size: int = 256) -> dict:
        rb, rs, rg = jax.random.split(rng, 3)
        ctx = self.base.xf_config.text_ctx
        toks = jnp.zeros((1, ctx), jnp.int32)
        mask = jnp.ones((1, ctx), jnp.int32)
        params = {
            "base": self.base.init(
                rb, jnp.zeros((1, base_size, base_size, 3)), jnp.zeros((1,), jnp.int32),
                toks, mask),
            "super_res": self.super_res.init(
                rs, jnp.zeros((1, sr_size, sr_size, 3)), jnp.zeros((1,), jnp.int32),
                jnp.zeros((1, base_size, base_size, 3)), toks, mask),
        }
        if self.srgan is not None:
            params["srgan"] = self.srgan.init(rg, jnp.zeros((1, 32, 32, 3)))
        return params


def _hoist_invariants(model, variables, dummy_args, method):
    """Capture loop-invariant per-step work (encoder K/V projections of the
    constant xf encoding, winograd weight transforms) OUTSIDE a sampler's
    `lax.scan` and return augmented variables whose collections the scan body
    reads as constants. Only the captured values' data paths stay live in the
    capture pass — the rest is dead code XLA eliminates. Mirrors the SD
    pipelines' _make_eps_fn capture (see models/glide.GlideAttentionBlock,
    models/layers.hoisted_wino_u)."""
    f = flags()
    if not f.hoist or (jax.default_backend() != "tpu" and not f.hoist_force):
        return variables
    # A/B on the full cascade (img/s/chip to 1024px, b8): no hoist 1.936,
    # encoder-KV only 1.954, winograd-U only 1.826 — U tensors held live as
    # scan constants regress GLIDE's small wino sites, unlike SD2 where the
    # U hoist is the big win. Default: KV only.
    cols = []
    if f.hoist_kv:
        cols.append("xattn_kv")
    if f.hoist_wino_glide:
        cols.append("wino_u")
    if not cols:
        return variables
    _, cap = model.apply(variables, *dummy_args, method=method,
                         mutable=cols)
    hoisted = {col: vals for col, vals in cap.items() if jax.tree.leaves(vals)}
    return {**variables, **hoisted}


class GlideCascadePipeline:
    def __init__(self, models: GlideModels):
        self.models = models

    def build_generate(
        self,
        batch_size: int = 1,
        guidance_scale: float = 5.0,
        base_size: int = 64,
        sr_size: int = 256,
        upsample_temp: float = 0.997,
        run_srgan: bool = True,
        uncond_mode: str = "per_generation",
    ) -> Callable:
        """jit(fn)(params, tokens, mask, key, row_seeds=None) -> dict of
        uint8 image stages.

        tokens/mask: (B, text_ctx) int32 (host-tokenized). Random-token uncond
        is drawn from `key` (vocab range [1, n_vocab-1), main_funcs.py:37).
        `row_seeds` (B,) int32 makes every row's randomness a function of its
        own seed (serving determinism under micro-batching; per_generation
        mode only).

        uncond_mode:
          * "per_generation" (default, fast): uncond tokens drawn once, their
            xf encoding hoisted out of the sampling scan (~60x less
            transformer work than the reference; statistically equivalent).
          * "per_step" (exact-parity): fresh random uncond tokens every
            sampling step, xf folded back into the scan — matches the
            reference's guider.py:36-50 / main_funcs.py:37-38 semantics.
        """
        if uncond_mode not in ("per_generation", "per_step"):
            raise ValueError(f"uncond_mode {uncond_mode!r}")
        m = self.models
        vocab = m.base.xf_config.n_vocab
        ctx = m.base.xf_config.text_ctx

        def fn(params, tokens, mask, key, row_seeds=None):
            # `row_seeds` (B,) int32: per-request seeds. When given, every
            # stochastic draw of row b (uncond tokens, base x_T, ancestral
            # per-step noise, super-res x_T) derives from fold_in(base, seed_b)
            # with a per-use tag — the row's output is then reproducible from
            # its own seed regardless of batch composition (serving/engine).
            # None (default, all CLI/bench paths) keeps the original programs.
            if row_seeds is not None and uncond_mode != "per_generation":
                raise ValueError("row_seeds requires uncond_mode="
                                 "'per_generation' (the per_step exact-parity "
                                 "mode draws batch-level uncond tokens)")
            b = tokens.shape[0]
            k_unc, k_base, k_sr, key = jax.random.split(key, 4)
            if row_seeds is not None:
                row_keys = jax.vmap(
                    lambda s: jax.random.fold_in(jax.random.PRNGKey(0), s)
                )(row_seeds)
                tag = lambda t: jax.vmap(  # noqa: E731 — tiny key-scoping helper
                    lambda rk: jax.random.fold_in(rk, t))(row_keys)

            # ---- base 64px stage, CFG with random-token uncond ----
            unc_mask = jnp.ones_like(mask)

            def encode_base(tok, msk):
                return m.base.apply(params["base"], tok, msk,
                                    method=m.base.encode_text)

            def cfg_denoise(x, t_orig, xf_proj2, xf_out2, variables=None):
                x2 = jnp.concatenate([x, x], axis=0)
                # batch-1 t (samplers.common.broadcast_t) broadcasts to both
                # CFG halves; a full-batch t needs the explicit duplicate
                t2 = (t_orig if t_orig.shape[0] == 1
                      else jnp.concatenate([t_orig, t_orig], axis=0))
                eps2, v2 = m.base.apply(variables if variables is not None
                                        else params["base"],
                                        x2, t2, xf_proj2, xf_out2,
                                        method=m.base.denoise)
                eps_c, eps_u = jnp.split(eps2, 2, axis=0)
                eps = eps_u + guidance_scale * (eps_c - eps_u)
                v_c, _ = jnp.split(v2, 2, axis=0)
                return eps, v_c

            if uncond_mode == "per_generation":
                if row_seeds is None:
                    unc_tokens = jax.random.randint(
                        k_unc, (b, ctx), 1, vocab - 1, jnp.int32)
                else:
                    unc_tokens = jax.vmap(lambda rk: jax.random.randint(
                        rk, (ctx,), 1, vocab - 1, jnp.int32))(tag(1))
                tok2 = jnp.concatenate([tokens, unc_tokens], axis=0)  # [cond; uncond]
                mask2 = jnp.concatenate([mask, unc_mask], axis=0)
                xf_proj2, xf_out2 = encode_base(tok2, mask2)

                # hoist loop-invariant work out of the sampling scan (XLA
                # won't): encoder K/V projections of the constant xf encoding
                # and the winograd weight transforms (capture pass; same
                # mechanism as the SD pipelines)
                base_vars = _hoist_invariants(
                    m.base, params["base"],
                    (jnp.zeros((2 * b, base_size, base_size, 3)),
                     jnp.zeros((2 * b,), jnp.int32), xf_proj2, xf_out2),
                    m.base.denoise)

                def base_model_fn(x, t_orig):
                    return cfg_denoise(x, t_orig, xf_proj2, xf_out2,
                                       variables=base_vars)

                model_takes_key = False
            else:
                # cond xf hoisted (same tokens every step => identical result);
                # uncond xf re-encoded inside the scan on per-step random tokens.
                xf_proj_c, xf_out_c = encode_base(tokens, mask)

                def base_model_fn(x, t_orig, k_step):
                    # ONE random token row per step, broadcast across the
                    # batch — the reference draws a single (ctx,) vector
                    # (main_funcs.py:37) that guider.py broadcast_to's over
                    # the uncond half; per-row draws would diverge for b>1
                    unc_row = jax.random.randint(
                        k_step, (ctx,), 1, vocab - 1, jnp.int32)
                    unc_tokens = jnp.broadcast_to(unc_row, (b, ctx))
                    xf_proj_u, xf_out_u = encode_base(unc_tokens, unc_mask)
                    xf_proj2 = jnp.concatenate([xf_proj_c, xf_proj_u], axis=0)
                    xf_out2 = jnp.concatenate([xf_out_c, xf_out_u], axis=0)
                    return cfg_denoise(x, t_orig, xf_proj2, xf_out2)

                model_takes_key = True

            if row_seeds is None:
                x_T = jax.random.normal(k_base, (b, base_size, base_size, 3),
                                        jnp.float32)
            else:
                x_T = jax.vmap(lambda rk: jax.random.normal(
                    rk, (base_size, base_size, 3), jnp.float32))(tag(2))
            img64 = ancestral.p_sample_loop(
                base_model_fn, x_T, m.base_schedule,
                key=jax.random.fold_in(key, 0),
                model_takes_key=model_takes_key,
                row_keys=None if row_seeds is None else tag(3))

            # ---- super-res 256px stage (no CFG) ----
            low_res = quantize_roundtrip(img64)
            xf_proj_s, xf_out_s = m.super_res.apply(
                params["super_res"], tokens, mask, method=m.super_res.encode_text)
            sr_vars = _hoist_invariants(
                m.super_res, params["super_res"],
                (jnp.zeros((b, sr_size, sr_size, 3)),
                 jnp.zeros((b,), jnp.int32), low_res, xf_proj_s, xf_out_s),
                m.super_res.denoise)

            if row_seeds is None:
                x_T_sr = upsample_temp * jax.random.normal(
                    k_sr, (b, sr_size, sr_size, 3), jnp.float32)
            else:
                x_T_sr = upsample_temp * jax.vmap(lambda rk: jax.random.normal(
                    rk, (sr_size, sr_size, 3), jnp.float32))(tag(4))

            def sr_model_fn(x, t_orig):
                return m.super_res.apply(sr_vars, x, t_orig, low_res,
                                         xf_proj_s, xf_out_s,
                                         method=m.super_res.denoise)

            img256 = ancestral.ddim_sample_loop(
                sr_model_fn, x_T_sr, m.sr_schedule)

            out = {"base": _to_uint8(img64), "super_res": _to_uint8(img256)}

            # ---- SRGAN x4 (fp32) ----
            if run_srgan and m.srgan is not None:
                img1024 = m.srgan.apply(params["srgan"],
                                        jnp.clip(img256, -1.0, 1.0).astype(jnp.float32))
                out["srgan"] = _to_uint8(img1024)
            return out

        return xla_opts.jit(fn)


def _to_uint8(x: jnp.ndarray) -> jnp.ndarray:
    return unit_range_to_uint8(x)
