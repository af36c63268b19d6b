"""F(4x4,3x3) vs F(2x2,3x3) vs XLA direct at the UNet's small-spatial sites.

The wino43 STATUS note only covers VAE-decoder shapes (>=128 spatial), where
the fp32 transforms are VPU-bound. The UNet's F22-winning sites are 16/32
spatial with deep aligned channels — 25x less transform work per MAC saved —
and were never measured. Run from the repo root on TPU.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/minddiffusion_jax_cache")

from minddiffusion_tpu.ops.winograd import conv3x3_winograd  # noqa: E402
from benchmarks.research.winograd43 import conv3x3_winograd43  # noqa: E402

STEPS = 20


def timed(fn, x, k, b):
    def body(h, _):
        y = fn(h, k, b)
        return y.astype(h.dtype), ()

    run = jax.jit(lambda x0: jax.lax.scan(body, x0, None, length=STEPS)[0])
    out = run(x)
    np.asarray(out[0, 0, 0])
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = run(x)
        np.asarray(out[0, 0, 0])
        times.append(time.perf_counter() - t0)
    return min(times) / STEPS


def xla_conv(x, k, b):
    y = jax.lax.conv_general_dilated(
        x, k.astype(x.dtype), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + b.astype(y.dtype)


# (B, H, C_in, C_out): the in-model F22-winning sites (square spatial);
# C_in==C_out keeps the scan carry shape-stable.
SHAPES = [
    # NOTE: 1280-wide sites are out of reach for the current F43 kernel —
    # U43 = 36*1280*1280*2B = 118 MB exceeds VMEM (would need combo-streamed
    # U + batch-merged M); only the 640->640 ds2 site fits as-is.
    (16, 32, 640, 640),     # ds2 resblock convs
]


def main():
    for bsz, hw, ci, co in SHAPES:
        x = jax.random.normal(
            jax.random.PRNGKey(0), (bsz, hw, hw, ci), jnp.bfloat16)
        k = jax.random.normal(
            jax.random.PRNGKey(1), (3, 3, ci, co), jnp.float32) * 0.02
        b = jnp.zeros((co,), jnp.float32)
        kb = k.astype(jnp.bfloat16)
        gflop = 2 * bsz * hw * hw * ci * co * 9 / 1e9
        res = {}
        res["xla"] = timed(xla_conv, x, kb, b)
        res["f22"] = timed(lambda x_, k_, b_: conv3x3_winograd(x_, k_, b_), x, kb, b)
        res["f43"] = timed(lambda x_, k_, b_: conv3x3_winograd43(x_, k_, b_), x, kb, b)
        line = f"{bsz}x{hw}^2x{ci}->{co}: " + "  ".join(
            f"{name} {ms*1e3:.3f}ms ({gflop/ms/1e3:.0f}T-eq)"
            for name, ms in res.items())
        print(line, flush=True)


if __name__ == "__main__":
    main()
