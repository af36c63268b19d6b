"""Opt-in XLA compiler options for the jitted pipeline programs.

``MDT_XLA_OPTS="xla_tpu_foo=true,xla_tpu_bar=8"`` threads per-program
compiler options into every pipeline jit via
``lower().compile(compiler_options=...)`` — the only channel that reliably
reaches the compiler through the remote-compile tunnel (an ``XLA_FLAGS`` env
var stays on the client side and never makes it into the compile request).
This is how winners from ``benchmarks/bench_flags.py`` ship without code
changes, and how ``bench_e2e_quick.py`` A/Bs option sets end-to-end.

With the env unset, :func:`jit` is exactly ``jax.jit`` — zero overhead, no
behavior change.
"""
from __future__ import annotations

import functools
import os

import jax


# Measured bench_flags.py winners ship here (TPU-only options; the dict is
# ignored off-TPU where the backend would reject them). MDT_XLA_OPTS entries
# override/extend these; MDT_XLA_OPTS=off disables everything.
SHIPPED: dict = {}


def compiler_options() -> dict | None:
    """SHIPPED defaults merged with MDT_XLA_OPTS ("k=v,k2=v2")."""
    raw = os.environ.get("MDT_XLA_OPTS", "").strip()
    if raw.lower() in ("off", "none"):
        return None
    opts = dict(SHIPPED) if jax.default_backend() == "tpu" else {}
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


def _aval_key(args):
    leaves, treedef = jax.tree.flatten(args)
    return treedef, tuple(
        (l.shape, str(l.dtype)) if hasattr(l, "shape") else repr(l)
        for l in leaves)


def jit(fn, **jit_kwargs):
    """``jax.jit`` that honors MDT_XLA_OPTS.

    Without the env var this IS ``jax.jit(fn, **jit_kwargs)``. With it, calls
    dispatch through a per-signature cache of ``lower().compile(opts)``
    programs (one entry per arg shape/dtype signature — pipeline programs
    have exactly one). Sharding/donation kwargs pass through ``jax.jit`` and
    survive the explicit lower/compile path.
    """
    jitted = jax.jit(fn, **jit_kwargs)
    opts = compiler_options()
    if not opts:
        return jitted

    cache: dict = {}

    @functools.wraps(fn)
    def call(*args):
        key = _aval_key(args)
        compiled = cache.get(key)
        if compiled is None:
            compiled = jitted.lower(*args).compile(compiler_options=opts)
            cache[key] = compiled
        return compiled(*args)

    call.lower = jitted.lower  # keep AOT introspection available
    return call
