"""Attention kernel shootout at SD2 spatial shapes, slope-timed.

The ~31ms per-program tunnel floor poisoned round-1 microbenchmarks
(ROADMAP.md r1 numbers): all timings here use the slope between 10- and
110-step scans, which cancels the floor. Shapes are the CFG-folded (B=16)
SD2 512x512 self-attention levels.

Variants:
  einsum        XLA (materializes scores; ds2/ds4 candidates)
  packed        round-1 production kernel (exact online softmax)
  packed_fast   static-shift softmax (no max pass)
  ones          NEW: per-head ones-column in V folds the softmax row-sum
                into the PV matmul (MXU, free at D=64 due to N padding);
                VPU work drops to max+exp (exact) or exp alone (fast)
"""
from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/minddiffusion_jax_cache")

from minddiffusion_tpu.ops.attention import einsum_attention  # noqa: E402
from minddiffusion_tpu.ops.flash_attention import flash_attention_packed  # noqa: E402

_FAST_SHIFT = 20.0


# --- ones-column kernel (single whole-row K block, packed heads) -----------

def _ones_kernel(q_ref, k_ref, va_ref, o_ref, *, scale, heads, d, exact):
    for h in range(heads):
        sl = slice(h * d, (h + 1) * d)
        q = (q_ref[0][:, sl].astype(jnp.float32) * scale).astype(q_ref.dtype)
        k = k_ref[0][:, sl]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        if exact:
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
        else:
            p = jnp.exp(s - _FAST_SHIFT)
        va = va_ref[0][:, h * 2 * d: (h + 1) * 2 * d]  # (nk, 2d): [v | ones...]
        acc = jax.lax.dot_general(
            p.astype(va.dtype), va, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # (bq, 2d)
        l = acc[:, d: d + 1]
        o_ref[0, :, sl] = (acc[:, :d] / l).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "heads", "block_q", "exact"))
def ones_attention(q, k, v, scale, heads, block_q=256, exact=True):
    b, nq, c = q.shape
    nk = k.shape[1]
    d = c // heads
    # v augmented per head to 2d lanes: [v_h | 1 | 0...]; keeps head slices
    # 128-aligned at d=64 and the PV matmul cost unchanged (N pads to 128)
    vh = v.reshape(b, nk, heads, d)
    ones = jnp.ones((b, nk, heads, 1), v.dtype)
    zeros = jnp.zeros((b, nk, heads, d - 1), v.dtype)
    va = jnp.concatenate([vh, ones, zeros], axis=-1).reshape(b, nk, heads * 2 * d)
    qb = min(block_q, nq)
    grid = (b, pl.cdiv(nq, qb))
    kernel = functools.partial(_ones_kernel, scale=scale, heads=heads, d=d,
                               exact=exact)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, qb, c), lambda b_, i: (b_, i, 0)),
            pl.BlockSpec((1, nk, c), lambda b_, i: (b_, 0, 0)),
            pl.BlockSpec((1, nk, 2 * c), lambda b_, i: (b_, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, qb, c), lambda b_, i: (b_, i, 0)),
        out_shape=jax.ShapeDtypeStruct((b, nq, c), q.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(q, k, va)


# --- timing -----------------------------------------------------------------

def slope_time(fn, args):
    def total(steps):
        def body(c, _):
            o = fn(*args)
            return c + o[0, 0, 0].astype(jnp.float32), ()
        run = jax.jit(lambda c0: jax.lax.scan(body, c0, None, length=steps)[0])
        out = run(jnp.float32(0)); np.asarray(out)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter(); out = run(jnp.float32(0)); np.asarray(out)
            ts.append(time.perf_counter() - t0)
        return min(ts)
    return (total(60) - total(10)) / 50


def main():
    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    rng = np.random.RandomState(0)
    shapes = [
        ("ds1", 16, 4096, 320, 5),
        ("ds2", 16, 1024, 640, 10),
        ("ds4", 16, 256, 1280, 20),
    ]
    only = sys.argv[1:]  # e.g. `bench_attention.py ds1 packed ones_fast`
    if only:
        shapes = [s for s in shapes if s[0] in only] or shapes
    for name, B, N, C, H in shapes:
        d = C // H
        scale = d ** -0.5
        q = jnp.asarray(rng.randn(B, N, C), jnp.bfloat16)
        k = jnp.asarray(rng.randn(B, N, C), jnp.bfloat16)
        v = jnp.asarray(rng.randn(B, N, C), jnp.bfloat16)
        flops = 4 * B * H * N * N * d

        def ein(q, k, v):
            o = einsum_attention(q.reshape(B, N, H, d), k.reshape(B, N, H, d),
                                 v.reshape(B, N, H, d), scale=scale)
            return o.reshape(B, N, C)

        variants = {
            "einsum": ein,
            "packed": lambda q, k, v: flash_attention_packed(
                q, k, v, scale=scale, heads=H, block_q=256, exact=True),
            "packed_fast": lambda q, k, v: flash_attention_packed(
                q, k, v, scale=scale, heads=H, block_q=256, exact=False),
            "ones": lambda q, k, v: ones_attention(
                q, k, v, scale=scale, heads=H, block_q=256, exact=True),
            "ones_fast": lambda q, k, v: ones_attention(
                q, k, v, scale=scale, heads=H, block_q=256, exact=False),
            "ones_bq512": lambda q, k, v: ones_attention(
                q, k, v, scale=scale, heads=H, block_q=512, exact=True),
        }
        if only and len(only) > 1:
            variants = {k_: f for k_, f in variants.items() if k_ in only} or variants
        # correctness spot check vs einsum
        ref = np.asarray(ein(q, k, v), np.float32)
        for vn, fn in variants.items():
            got = np.asarray(fn(q, k, v), np.float32)
            err = np.abs(got - ref).max()
            t = slope_time(fn, (q, k, v))
            print(f"{name} B{B} N{N} H{H}x{d}: {vn:12s} {t*1e3:7.3f}ms "
                  f"{flops/t/1e12:6.1f}T  maxerr {err:.1e}", flush=True)


if __name__ == "__main__":
    main()
