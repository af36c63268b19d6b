"""Diffusion noise schedules and respacing — host-side fp64 math, device fp32 tables.

TPU-first design notes
----------------------
All schedule tables are computed **once on the host in float64 numpy** and then
frozen into a `DiffusionSchedule` pytree of fp32 `jnp` arrays. Samplers index
these tables with gathers inside a single jitted `lax.scan` — there is no
per-step host arithmetic anywhere in the framework.

Behavioral parity targets (reference = mindspore-lab/minddiffusion):
  * SD "linear" schedule: betas = linspace(sqrt(start), sqrt(end), T)**2
    (reference: stablediffusionv2/ldm/modules/diffusionmodules/util.py:172-185).
    The reference computes this on CPU fp32 then casts tables to model dtype;
    we keep fp64 for construction and fp32 for the tables, which matches the
    reference within fp32 ulp (verified in tests/test_schedules.py).
  * DDIM timestep selection + (alpha, alpha_prev, sigma) triplets
    (reference: util.py:134-162).
  * GLIDE named schedules "linear" (Ho et al, scaled by 1000/T) and
    "squaredcos_cap_v2", and the `space_timesteps` respacing grammar including
    "ddimN" and "fast27"
    (reference: Taichu-GLIDE/model/glide_text2im/gaussian_computation.py:20-163).
"""
from __future__ import annotations

import math
from typing import Sequence, Set, Union

import numpy as np
import jax.numpy as jnp
from flax import struct

__all__ = [
    "make_beta_schedule",
    "betas_for_alpha_bar",
    "DiffusionSchedule",
    "make_ddim_timesteps",
    "ddim_sampling_parameters",
    "space_timesteps",
    "respace_schedule",
]


# ---------------------------------------------------------------------------
# Beta schedules (host-side numpy, float64)
# ---------------------------------------------------------------------------

def make_beta_schedule(
    schedule: str = "linear",
    n_timestep: int = 1000,
    linear_start: float = 1e-4,
    linear_end: float = 2e-2,
    cosine_s: float = 8e-3,
) -> np.ndarray:
    """Build a beta schedule as a float64 numpy array of shape (n_timestep,).

    Schedules:
      "linear"            — SD-style sqrt-space linear (latent-diffusion convention).
      "linear_plain"      — Ho et al. linear in beta space, scaled by 1000/T
                            (GLIDE convention, reference gaussian_computation.py:29-38).
      "squaredcos_cap_v2" — cosine alpha-bar schedule capped at beta<=0.999
                            (reference gaussian_computation.py:39-43).
      "quad"              — linear in sqrt space with explicit endpoints.
    """
    if schedule == "linear":
        # NOTE: reference computes linspace in fp32 on CPU (util.py:173); fp64 here
        # agrees to fp32 ulp once cast, and is exactly reproducible.
        betas = np.linspace(linear_start**0.5, linear_end**0.5, n_timestep, dtype=np.float64) ** 2
    elif schedule == "linear_plain":
        scale = 1000.0 / n_timestep
        betas = np.linspace(scale * 1e-4, scale * 2e-2, n_timestep, dtype=np.float64)
    elif schedule == "squaredcos_cap_v2":
        betas = betas_for_alpha_bar(
            n_timestep, lambda t: math.cos((t + cosine_s) / (1 + cosine_s) * math.pi / 2) ** 2
        )
    elif schedule == "quad":
        # numerically identical to "linear" above (LDM's "linear" IS the
        # sqrt-space ramp); kept as an explicit alias for config compat
        betas = np.linspace(linear_start**0.5, linear_end**0.5, n_timestep, dtype=np.float64) ** 2
    else:
        raise ValueError(f"unknown beta schedule: {schedule!r}")
    assert betas.shape == (n_timestep,)
    return betas


def betas_for_alpha_bar(n_timestep: int, alpha_bar, max_beta: float = 0.999) -> np.ndarray:
    """Discretize a continuous alpha-bar function into betas (float64)."""
    t = np.arange(n_timestep, dtype=np.float64)
    a1 = np.array([alpha_bar(x) for x in t / n_timestep])
    a2 = np.array([alpha_bar(x) for x in (t + 1) / n_timestep])
    return np.minimum(1.0 - a2 / a1, max_beta)


# ---------------------------------------------------------------------------
# DiffusionSchedule — the frozen device-side table pytree
# ---------------------------------------------------------------------------

@struct.dataclass
class DiffusionSchedule:
    """All per-timestep tables a sampler or trainer needs, as fp32 jnp arrays.

    Mirrors the buffer set registered by the reference's DDPM.register_schedule
    (stablediffusionv2/ldm/models/diffusion/ddpm.py:111-161) plus GLIDE's
    posterior tables (gaussian_diffusion.py), derived here once in fp64.

    Being a `flax.struct` dataclass, it is a pytree: it can be closed over by a
    jitted sampler or passed as an argument, donated, or device-replicated.
    """

    betas: jnp.ndarray
    alphas_cumprod: jnp.ndarray
    alphas_cumprod_prev: jnp.ndarray
    sqrt_alphas_cumprod: jnp.ndarray
    sqrt_one_minus_alphas_cumprod: jnp.ndarray
    log_one_minus_alphas_cumprod: jnp.ndarray
    sqrt_recip_alphas_cumprod: jnp.ndarray
    sqrt_recipm1_alphas_cumprod: jnp.ndarray
    posterior_variance: jnp.ndarray
    posterior_log_variance_clipped: jnp.ndarray
    posterior_mean_coef1: jnp.ndarray
    posterior_mean_coef2: jnp.ndarray
    lvlb_weights: jnp.ndarray
    # For respaced (GLIDE) schedules: maps spaced index -> original timestep.
    # For unspaced schedules this is arange(T).
    timestep_map: jnp.ndarray
    num_timesteps: int = struct.field(pytree_node=False)

    @classmethod
    def from_betas(
        cls,
        betas: np.ndarray,
        v_posterior: float = 0.0,
        timestep_map: np.ndarray | None = None,
    ) -> "DiffusionSchedule":
        betas = np.asarray(betas, dtype=np.float64)
        (T,) = betas.shape
        alphas = 1.0 - betas
        alphas_cumprod = np.cumprod(alphas, axis=0)
        alphas_cumprod_prev = np.append(1.0, alphas_cumprod[:-1])

        posterior_variance = (
            (1 - v_posterior) * betas * (1.0 - alphas_cumprod_prev) / (1.0 - alphas_cumprod)
            + v_posterior * betas
        )
        # eps-parameterization VLB weights (ddpm.py:153-160); w[0] := w[1] to
        # dodge the division blow-up at t=0 (posterior_variance[0] == 0).
        with np.errstate(divide="ignore"):
            lvlb = betas**2 / (2 * posterior_variance * alphas * (1 - alphas_cumprod))
        lvlb[0] = lvlb[1]

        if timestep_map is None:
            timestep_map = np.arange(T, dtype=np.int64)

        f32 = lambda x: jnp.asarray(x, dtype=jnp.float32)
        return cls(
            betas=f32(betas),
            alphas_cumprod=f32(alphas_cumprod),
            alphas_cumprod_prev=f32(alphas_cumprod_prev),
            sqrt_alphas_cumprod=f32(np.sqrt(alphas_cumprod)),
            sqrt_one_minus_alphas_cumprod=f32(np.sqrt(1.0 - alphas_cumprod)),
            log_one_minus_alphas_cumprod=f32(np.log(1.0 - alphas_cumprod)),
            sqrt_recip_alphas_cumprod=f32(np.sqrt(1.0 / alphas_cumprod)),
            sqrt_recipm1_alphas_cumprod=f32(np.sqrt(1.0 / alphas_cumprod - 1)),
            posterior_variance=f32(posterior_variance),
            # t=0 entry clipped to pv[1], the GLIDE reference convention
            # (gaussian_diffusion.py: log(append(pv[1], pv[1:]))). Its only
            # consumers are GLIDE paths (ancestral learned-var interp, VLB
            # loss at t==0); no SD path reads this table at t=0 (PLMS/DDIM/
            # DPM never use it, and the SD lvlb weights already do w[0]:=w[1])
            posterior_log_variance_clipped=f32(
                np.log(np.append(posterior_variance[1], posterior_variance[1:]))
                if T > 1 else np.log(np.maximum(posterior_variance, 1e-20))),
            posterior_mean_coef1=f32(betas * np.sqrt(alphas_cumprod_prev) / (1.0 - alphas_cumprod)),
            posterior_mean_coef2=f32(
                (1.0 - alphas_cumprod_prev) * np.sqrt(alphas) / (1.0 - alphas_cumprod)
            ),
            lvlb_weights=f32(lvlb),
            timestep_map=jnp.asarray(timestep_map, dtype=jnp.int32),
            num_timesteps=int(T),
        )

    @classmethod
    def create(
        cls,
        schedule: str = "linear",
        n_timestep: int = 1000,
        linear_start: float = 1e-4,
        linear_end: float = 2e-2,
        cosine_s: float = 8e-3,
        v_posterior: float = 0.0,
    ) -> "DiffusionSchedule":
        betas = make_beta_schedule(schedule, n_timestep, linear_start, linear_end, cosine_s)
        return cls.from_betas(betas, v_posterior=v_posterior)

    # ---- q(x_t | x_0) utilities (used by training losses and img2img) ----

    def q_sample(self, x_start: jnp.ndarray, t: jnp.ndarray, noise: jnp.ndarray) -> jnp.ndarray:
        """Diffuse x_start to timestep t. t: int32 (B,). Broadcast over trailing dims."""
        a = _extract(self.sqrt_alphas_cumprod, t, x_start.ndim)
        s = _extract(self.sqrt_one_minus_alphas_cumprod, t, x_start.ndim)
        return a * x_start.astype(jnp.float32) + s * noise.astype(jnp.float32)

    def predict_xstart_from_eps(self, x_t, t, eps):
        a = _extract(self.sqrt_recip_alphas_cumprod, t, x_t.ndim)
        b = _extract(self.sqrt_recipm1_alphas_cumprod, t, x_t.ndim)
        return a * x_t.astype(jnp.float32) - b * eps.astype(jnp.float32)

    def q_posterior_mean(self, x_start, x_t, t):
        c1 = _extract(self.posterior_mean_coef1, t, x_t.ndim)
        c2 = _extract(self.posterior_mean_coef2, t, x_t.ndim)
        return c1 * x_start.astype(jnp.float32) + c2 * x_t.astype(jnp.float32)


def _extract(table: jnp.ndarray, t: jnp.ndarray, ndim: int) -> jnp.ndarray:
    """Gather table[t] and reshape to (B, 1, 1, ...) for broadcasting."""
    out = jnp.take(table, t, axis=0)
    return out.reshape(out.shape + (1,) * (ndim - out.ndim))


# ---------------------------------------------------------------------------
# DDIM sub-schedules (SD family)
# ---------------------------------------------------------------------------

def make_ddim_timesteps(
    num_ddim_timesteps: int,
    num_ddpm_timesteps: int = 1000,
    method: str = "uniform",
) -> np.ndarray:
    """Select the DDIM timestep subset, int64 ascending, shifted by +1.

    Matches reference util.py:134-148 ("uniform": range(0, T, T//S) + 1).
    """
    if not 1 <= num_ddim_timesteps <= num_ddpm_timesteps:
        raise ValueError(
            f"num_ddim_timesteps must be in [1, {num_ddpm_timesteps}], "
            f"got {num_ddim_timesteps}")
    if method == "uniform":
        # For S | T this is exactly the reference's range(0, T, T//S)+1. For
        # non-dividing S the reference's arange overshoots and indexes out of
        # range; we instead always emit exactly S in-range steps.
        c = num_ddpm_timesteps // num_ddim_timesteps
        if c == 1:
            # S > T/2: the stride formula would compress the schedule to
            # t <= S (and its +1 shift indexes out of range at S == T); an
            # evenly spaced in-range subsequence spans the full chain
            # (the reference crashes here — no parity to preserve).
            return np.linspace(0, num_ddpm_timesteps - 1,
                               num_ddim_timesteps).round().astype(np.int64)
        ts = np.arange(num_ddim_timesteps, dtype=np.int64) * c
    elif method == "quad":
        ts = (np.linspace(0, np.sqrt(num_ddpm_timesteps * 0.8), num_ddim_timesteps) ** 2).astype(
            np.int64
        )
    else:
        raise ValueError(f"unknown ddim discretization: {method!r}")
    return ts + 1


def ddim_sampling_parameters(
    alphas_cumprod: np.ndarray, ddim_timesteps: np.ndarray, eta: float = 0.0
):
    """(sigmas, alphas, alphas_prev) for the chosen DDIM subset (util.py:151-162)."""
    alphas_cumprod = np.asarray(alphas_cumprod, dtype=np.float64)
    alphas = alphas_cumprod[ddim_timesteps]
    alphas_prev = np.concatenate([[alphas_cumprod[0]], alphas_cumprod[ddim_timesteps[:-1]]])
    sigmas = eta * np.sqrt((1 - alphas_prev) / (1 - alphas) * (1 - alphas / alphas_prev))
    return sigmas, alphas, alphas_prev


# ---------------------------------------------------------------------------
# GLIDE-style respacing
# ---------------------------------------------------------------------------

def space_timesteps(num_timesteps: int, section_counts: Union[str, Sequence[int]]) -> Set[int]:
    """Select a subset of original timesteps per the GLIDE respacing grammar.

    Accepts "ddimN", "fast27", a comma string, or a list of per-section counts.
    Reference behavior: gaussian_computation.py:109-163.
    """
    if isinstance(section_counts, str):
        if section_counts.startswith("ddim"):
            desired = int(section_counts[len("ddim"):])
            for stride in range(1, num_timesteps):
                if len(range(0, num_timesteps, stride)) == desired:
                    return set(range(0, num_timesteps, stride))
            raise ValueError(f"cannot create exactly {desired} ddim steps with an integer stride")
        if section_counts == "fast27":
            steps = space_timesteps(num_timesteps, "10,10,3,2,2")
            # Swap the noisiest step for T-3 to reduce DDIM artifacts.
            steps.remove(num_timesteps - 1)
            steps.add(num_timesteps - 3)
            return steps
        section_counts = [int(x) for x in section_counts.split(",")]

    size_per = num_timesteps // len(section_counts)
    extra = num_timesteps % len(section_counts)
    start_idx = 0
    all_steps: list[int] = []
    for i, count in enumerate(section_counts):
        size = size_per + (1 if i < extra else 0)
        if size < count:
            raise ValueError(f"cannot divide section of {size} steps into {count}")
        frac_stride = 1.0 if count <= 1 else (size - 1) / (count - 1)
        cur = 0.0
        for _ in range(count):
            all_steps.append(start_idx + round(cur))
            cur += frac_stride
        start_idx += size
    return set(all_steps)


def respace_schedule(
    base_betas: np.ndarray,
    use_timesteps: Union[Set[int], Sequence[int]],
    v_posterior: float = 0.0,
) -> DiffusionSchedule:
    """Build a respaced DiffusionSchedule over the selected original timesteps.

    New betas are chosen so the respaced chain reproduces the original
    alpha-bar values at the kept timesteps (the standard SpacedDiffusion
    construction; reference diffusion_creator.py uses the same identity).
    `timestep_map` lets the model be called with original timestep indices.
    """
    base_betas = np.asarray(base_betas, dtype=np.float64)
    alphas_cumprod = np.cumprod(1.0 - base_betas)
    use = sorted(int(t) for t in set(use_timesteps))
    last_alpha = 1.0
    new_betas, tmap = [], []
    for t in use:
        new_betas.append(1.0 - alphas_cumprod[t] / last_alpha)
        last_alpha = alphas_cumprod[t]
        tmap.append(t)
    return DiffusionSchedule.from_betas(
        np.array(new_betas), v_posterior=v_posterior, timestep_map=np.array(tmap, dtype=np.int64)
    )
