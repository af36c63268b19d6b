"""Conv3x3 kernel shootout at SD UNet resblock shapes (see ROADMAP.md).

Measures XLA's native conv vs the two Pallas implicit-GEMM kernels
(ops/conv3x3.py), scan-amortized on the real TPU, bf16, CFG-folded batch 16.
Run from the repo root: python benchmarks/bench_conv.py
"""
from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/minddiffusion_jax_cache")

from benchmarks.research.conv3x3 import conv3x3_gemm, conv3x3_pallas  # noqa: E402
from minddiffusion_tpu.ops.winograd import conv3x3_winograd  # noqa: E402

STEPS = 20


def timed(fn, x, k, b):
    """Scan STEPS dependent iterations (carry feeds the next input)."""

    def body(h, _):
        y = fn(h, k, b)
        return y.astype(h.dtype), ()

    run = jax.jit(lambda x0: jax.lax.scan(body, x0, None, length=STEPS)[0])
    out = run(x)
    np.asarray(out[0, 0, 0])  # force real transfer (axon relay)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = run(x)
        np.asarray(out[0, 0, 0])
        times.append(time.perf_counter() - t0)
    return min(times) / STEPS


def xla_conv(x, k, b):
    y = jax.lax.conv_general_dilated(
        x, k, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    return (y + b).astype(x.dtype)


def main():
    print(f"device: {jax.devices()[0].device_kind}")
    shapes = [
        (16, 64, 64, 320),
        (16, 32, 32, 640),
        (16, 16, 16, 1280),
        (16, 8, 8, 1280),
        # VAE decoder shapes (batch 8, no CFG fold)
        (8, 64, 64, 512),
        (8, 128, 128, 512),
        (8, 256, 256, 256),
        (8, 512, 512, 128),
    ]
    if os.environ.get("MDT_BENCH_SHAPES"):
        keep = os.environ["MDT_BENCH_SHAPES"].split(",")
        shapes = [s for s in shapes if f"{s[1]}x{s[3]}" in keep]
    rng = np.random.RandomState(0)
    for (B, H, W, C) in shapes:
        x = jnp.asarray(rng.randn(B, H, W, C), jnp.bfloat16)
        k = jnp.asarray(rng.randn(3, 3, C, C) * 0.02, jnp.bfloat16)
        b = jnp.asarray(rng.randn(C), jnp.float32)
        flops = 2 * B * H * W * 9 * C * C
        only = sys.argv[1:]

        def xla_bf16out(x_, k_, b_):
            # flax nn.Conv's actual lowering: no preferred fp32 output
            y = jax.lax.conv_general_dilated(
                x_, k_, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return y + b_.astype(y.dtype)

        variants = {
            "xla": lambda x_, k_, b_: xla_conv(x_, k_, b_),
            "xla16": xla_bf16out,
            "v1": lambda x_, k_, b_: conv3x3_pallas(x_, k_, b_),
            "v2": lambda x_, k_, b_: conv3x3_gemm(x_, k_, b_),
            "wino": lambda x_, k_, b_: conv3x3_winograd(x_, k_, b_),
            "wino64": lambda x_, k_, b_: conv3x3_winograd(x_, k_, b_,
                                                          block_rows=64),
            "winobf16": lambda x_, k_, b_: conv3x3_winograd(
                x_, k_, b_, fp32_transform=False),
            "wino64bf16": lambda x_, k_, b_: conv3x3_winograd(
                x_, k_, b_, block_rows=64, fp32_transform=False),
        }
        if only:
            variants = {n: f for n, f in variants.items() if n in only}
        res = {}
        for name, fn in variants.items():
            res[name] = timed(fn, x, k, b)
        line = f"B{B} {H}x{W} C{C}: " + "  ".join(
            f"{name} {t*1e3:.3f}ms {flops/t/1e12:.1f}T" for name, t in res.items()
        )
        print(line, flush=True)


if __name__ == "__main__":
    main()
