"""PLMS (pseudo linear multistep) sampler as one `lax.scan` program.

Order ramp (Euler bootstrap -> 2nd -> 3rd -> 4th-order Adams-Bashforth on eps)
matches the reference's host-side `old_eps` list logic
(stablediffusionv2/ldm/models/diffusion/plms.py:182-247), but the history is a
fixed (3, ...) buffer carried through the scan and the per-order combine is a
`lax.switch` on the step index — fully jittable, zero host round-trips.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from minddiffusion_tpu.core.schedules import DiffusionSchedule
from minddiffusion_tpu.samplers import common
from minddiffusion_tpu.samplers.ddim import build_tables


def sample(
    eps_fn: common.EpsFn,
    x_T: jnp.ndarray,
    schedule: DiffusionSchedule,
    num_steps: int = 50,
    eta: float = 0.0,
    key: Optional[jax.Array] = None,
    mask: Optional[jnp.ndarray] = None,
    x0: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    if eta != 0.0:
        raise ValueError("eta must be 0 for PLMS (reference plms.py:36)")
    tables = build_tables(schedule, num_steps, eta=0.0)
    n = int(tables["t"].shape[0])
    # t_next[i]: the model timestep of the following step (plms.py ts_next),
    # clamped at the last entry.
    t_np = tables["t"]
    t_next = common.as_i32(np.concatenate([t_np[1:], t_np[-1:]]))

    keys = common.per_step_keys(key, n)
    blend = common.masked_blend_fn(
        mask, x0, schedule.sqrt_alphas_cumprod, schedule.sqrt_one_minus_alphas_cumprod
    )
    batch = x_T.shape[0]

    def x_prev_from_eps(x, e_t, a_t, a_prev):
        pred_x0 = (x - jnp.sqrt(1.0 - a_t) * e_t) / jnp.sqrt(a_t)
        dir_xt = jnp.sqrt(1.0 - a_prev) * e_t
        return jnp.sqrt(a_prev) * pred_x0 + dir_xt

    def step(carry, per_step):
        x, hist = carry  # hist: (3, ...) newest at [-1]
        i, t, tn, a_t, a_prev, a_next, k = per_step
        tb = common.broadcast_t(t, batch)
        x = blend(x, tb, k)
        x = x.astype(jnp.float32)
        e_t = eps_fn(x, tb).astype(jnp.float32)

        def order1(_):
            # Euler step then midpoint correction with a second model eval
            # at t_next (plms.py:218-222).
            x_pred = x_prev_from_eps(x, e_t, a_t, a_prev)
            e_next = eps_fn(x_pred, common.broadcast_t(tn, batch)).astype(jnp.float32)
            return (e_t + e_next) / 2.0

        def order2(_):
            return (3.0 * e_t - hist[2]) / 2.0

        def order3(_):
            return (23.0 * e_t - 16.0 * hist[2] + 5.0 * hist[1]) / 12.0

        def order4(_):
            return (55.0 * e_t - 59.0 * hist[2] + 37.0 * hist[1] - 9.0 * hist[0]) / 24.0

        e_prime = jax.lax.switch(jnp.minimum(i, 3), [order1, order2, order3, order4], None)
        x_prev = x_prev_from_eps(x, e_prime, a_t, a_prev)
        new_hist = jnp.roll(hist, shift=-1, axis=0).at[-1].set(e_t)
        return (x_prev, new_hist), None

    # a_next is unused by the order-1 corrector in the reference (the second
    # eval reuses get_x_prev at the *current* index); kept for clarity.
    idx = np.arange(n, dtype=np.int32)
    a_next = np.concatenate([tables["alpha_prev"][1:], tables["alpha_prev"][-1:]])
    xs = (idx, tables["t"], t_next, tables["alpha"], tables["alpha_prev"], a_next, keys)
    hist0 = jnp.zeros((3,) + x_T.shape, dtype=jnp.float32)
    (x_final, _), _ = jax.lax.scan(step, (x_T.astype(jnp.float32), hist0), xs)
    return x_final
