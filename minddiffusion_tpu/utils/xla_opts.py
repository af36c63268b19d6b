"""Opt-in XLA compiler options for the jitted pipeline/train programs.

``MDT_XLA_OPTS="xla_tpu_foo=true,xla_tpu_bar=8"`` threads per-program
compiler options into every pipeline jit via ``jax.jit(compiler_options=...)``
— the only channel that reliably reaches the compiler through the
remote-compile tunnel (an ``XLA_FLAGS`` env var stays on the client side and
never makes it into the compile request). This is how winners from
``benchmarks/bench_flags.py`` ship without code changes, and how
``bench_e2e_quick.py`` A/Bs option sets end-to-end.

With the env unset (and no SHIPPED winners), :func:`jit` is exactly
``jax.jit`` — zero overhead, no behavior change, and crucially no backend
initialization at construction time (a backend touch here would block on the
pooled-TPU chip claim for host-only tooling).
"""
from __future__ import annotations

import os

import jax

# Measured bench_flags.py winners ship here (TPU-only options; the dict is
# ignored off-TPU where the backend would reject them). MDT_XLA_OPTS entries
# override/extend these; MDT_XLA_OPTS=off disables everything.
#
# xla_tpu_licm_size_inflation_ratio=2: the r3 compiler-option sweep's only
# winner (bench_flags.py 2-run: 1.924 vs 1.910 baseline; 3-run confirm
# 1.9231; dose probes licm8=1.920, licm4=1.9228 — flat response, ship the
# cheapest dose). Lets XLA hoist more loop-invariant work (per-step weight
# relayouts) out of the sampler lax.scan, on top of the manual K/V + wino-U
# hoisting. Every other swept option measured neutral-to-negative (see
# ROADMAP "XLA compiler-option sweep").
SHIPPED: dict = {"xla_tpu_licm_size_inflation_ratio": "2"}


def _tpu_platform() -> bool:
    """Whether the process targets a TPU backend, WITHOUT initializing it.

    jax.default_backend() initializes the backend, which on the pooled-TPU
    relay ("axon" platform) claims the chip and can block for minutes — a
    host-only caller constructing a jitted program must not hang here
    (ADVICE r3). The platform list (jax_platforms config / JAX_PLATFORMS
    env) is inspectable for free; only when it is completely unset do we
    fall back to the initializing probe."""
    plats = (jax.config.jax_platforms or os.environ.get("JAX_PLATFORMS")
             or "").strip()
    if plats:
        return plats.split(",")[0].strip().lower() in ("tpu", "axon")
    return jax.default_backend() == "tpu"


def compiler_options() -> dict | None:
    """SHIPPED defaults merged with MDT_XLA_OPTS ("k=v,k2=v2")."""
    raw = os.environ.get("MDT_XLA_OPTS", "").strip()
    if raw.lower() in ("off", "none"):
        return None
    opts = dict(SHIPPED) if SHIPPED and _tpu_platform() else {}
    for item in raw.split(","):
        item = item.strip()
        if not item:
            continue
        if "=" not in item:
            raise ValueError(
                f"MDT_XLA_OPTS entries must be key=value, got {item!r}")
        k, v = item.split("=", 1)
        opts[k.strip()] = v.strip()
    return opts or None


def jit(fn, **jit_kwargs):
    """``jax.jit`` that honors MDT_XLA_OPTS (+ SHIPPED winners on TPU).

    jax.jit's native ``compiler_options`` parameter carries the options into
    the executable build (same plumbing as ``lower().compile(...)``), so
    dispatch, kwargs support, donation, and AOT ``.lower()`` introspection
    are all stock jax.jit behavior.
    """
    opts = compiler_options()
    if opts:
        return jax.jit(fn, compiler_options=opts, **jit_kwargs)
    return jax.jit(fn, **jit_kwargs)
