"""Probe: where is the conv3x3 performance ceiling on this chip?

1. XLA native conv (the incumbent)
2. pure-XLA implicit GEMM: R = concat of 3 dy-shifted rows (K=3C), three
   (M,K)@(K,N) dots, dx resolved by shifted adds, slice to (H, W)
3. raw GEMM microbench at the same (M, K, N) — the MXU ceiling
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/minddiffusion_jax_cache")

STEPS = 20


def force(out):
    leaf = jax.tree.leaves(out)[0]
    np.asarray(leaf[(0,) * leaf.ndim])  # tiny device-side slice -> host


def timed(run, x):
    out = run(x)
    force(out)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = run(x)
        force(out)
        times.append(time.perf_counter() - t0)
    return min(times) / STEPS


def scan_chain(fn):
    def run(x0):
        def body(h, _):
            return fn(h).astype(h.dtype), ()
        return jax.lax.scan(body, x0, None, length=STEPS)[0]
    return jax.jit(run)


def main():
    print(f"device: {jax.devices()[0].device_kind}")
    rng = np.random.RandomState(0)
    for (B, H, W, C) in [(16, 64, 64, 320), (16, 32, 32, 640), (16, 16, 16, 1280)]:
        x = jnp.asarray(rng.randn(B, H, W, C), jnp.bfloat16)
        k = jnp.asarray(rng.randn(3, 3, C, C) * 0.02, jnp.bfloat16)
        b = jnp.asarray(rng.randn(C), jnp.float32)
        flops = 2 * B * H * W * 9 * C * C

        def xla_conv(h):
            y = jax.lax.conv_general_dilated(
                h, k, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32)
            return y + b

        w2 = k.transpose(1, 0, 2, 3).reshape(3, 3 * C, C)  # (dx, 3C, C)

        def xla_gemm(h):
            xp = jnp.pad(h, ((0, 0), (1, 1), (1, 1), (0, 0)))
            r = jnp.concatenate([xp[:, dy:dy + H] for dy in range(3)], axis=-1)
            # r: (B, H, W+2, 3C)
            p0 = jnp.einsum("bhwk,kn->bhwn", r, w2[0],
                            preferred_element_type=jnp.float32)
            p1 = jnp.einsum("bhwk,kn->bhwn", r, w2[1],
                            preferred_element_type=jnp.float32)
            p2 = jnp.einsum("bhwk,kn->bhwn", r, w2[2],
                            preferred_element_type=jnp.float32)
            return p0[:, :, 0:W] + p1[:, :, 1:W + 1] + p2[:, :, 2:W + 2] + b

        t = timed(scan_chain(xla_conv), x)
        print(f"B{B} {H}x{W} C{C}: xla_conv  {t*1e3:.3f}ms {flops/t/1e12:.1f}T")
        t = timed(scan_chain(xla_gemm), x)
        print(f"B{B} {H}x{W} C{C}: xla_gemm  {t*1e3:.3f}ms {flops/t/1e12:.1f}T")

        # raw GEMM ceiling: (M, 3C) @ (3C, C) three times
        M = B * H * (W + 2)
        r0 = jnp.asarray(rng.randn(M, 3 * C), jnp.bfloat16)

        def raw(rr):
            acc = sum(jnp.dot(rr, w2[i], preferred_element_type=jnp.float32)
                      for i in range(3))
            return acc[:, :C//2 * 2].astype(jnp.bfloat16) @ jnp.ones(
                (C, 3 * C), jnp.bfloat16)  # cycle back to input shape

        # simpler: time one dot triple via scan over independent slices
        def raw_run(rr):
            def body(h, _):
                acc = sum(jnp.dot(h, w2[i], preferred_element_type=jnp.float32)
                          for i in range(3))
                hn = jnp.concatenate([acc.astype(jnp.bfloat16)] * 3, axis=-1)
                return hn * 1e-3, ()
            return jax.lax.scan(body, rr, None, length=STEPS)[0]

        t = timed(jax.jit(raw_run), r0)
        gf = 2 * M * 3 * C * C * 3
        print(f"B{B} {H}x{W} C{C}: raw_gemm  {t*1e3:.3f}ms {gf/t/1e12:.1f}T "
              f"(M={M} K={3*C} N={C})", flush=True)


if __name__ == "__main__":
    main()
