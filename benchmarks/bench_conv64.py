"""Shootout for the 64²x320 conv (the UNet's dominant XLA-conv shape after
winograd took the 16²/32² resblocks; profile: XLA 'convolution fusion' is
~48 ms of the 87.5 ms step and this shape is most of it).

Variants:
  xla      — lax.conv_general_dilated (what nn.Conv lowers to)   [baseline]
  ninesum  — 9 shifted (BHW, C)@(C, Co) GEMMs accumulated
  im2col   — conv_general_dilated_patches -> one (BHW, 9C)@(9C, Co) GEMM
  wino*    — winograd kernel block_rows variants

Usage: python benchmarks/bench_conv64.py [variant ...] [--shape HxC[:Co]]
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

jax.config.update("jax_compilation_cache_dir", "/tmp/minddiffusion_jax_cache")

from minddiffusion_tpu.ops.winograd import conv3x3_winograd  # noqa: E402

B, H, C, CO = 16, 64, 320, 320
for a in list(sys.argv[1:]):
    if a.startswith("--shape"):
        sys.argv.remove(a)
        spec = a.split("=", 1)[1]
        hw, rest = spec.split("x")
        H = int(hw)
        C, CO = (int(rest.split(":")[0]),
                 int(rest.split(":")[1]) if ":" in rest else int(rest.split(":")[0]))
W = H
STEPS = int(os.environ.get('MDT_CONV_STEPS', '100'))


def xla(x, k, b):
    y = jax.lax.conv_general_dilated(
        x, k, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + b.astype(y.dtype)


def ninesum(x, k, b):
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc = None
    for dy in range(3):
        for dx in range(3):
            sl = xp[:, dy:dy + H, dx:dx + W].reshape(B * H * W, C)
            p = jax.lax.dot_general(sl, k[dy, dx], (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            acc = p if acc is None else acc + p
    return (acc + b).astype(x.dtype).reshape(B, H, W, CO)


def im2col(x, k, b):
    # patches: (B, H, W, C*9) with channel-major (c, kh, kw) ordering
    pat = jax.lax.conv_general_dilated_patches(
        x, (3, 3), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    kc = k.transpose(2, 0, 1, 3).reshape(C * 9, CO)   # match (c, kh, kw)
    y = jax.lax.dot_general(pat.reshape(B * H * W, C * 9), kc.astype(x.dtype),
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    return (y + b).astype(x.dtype).reshape(B, H, W, CO)


VARIANTS = {
    "xla": xla,
    "ninesum": ninesum,
    "im2col": im2col,
    "wino32": lambda x, k, b: conv3x3_winograd(x, k, b, block_rows=32),
    "wino64": lambda x, k, b: conv3x3_winograd(x, k, b, block_rows=64),
    "wino64bf16": lambda x, k, b: conv3x3_winograd(x, k, b, block_rows=64,
                                                   fp32_transform=False),
}


def main():
    print(f"device: {jax.devices()[0].device_kind}  B{B} {H}x{W} C{C}->{CO}",
          flush=True)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, H, W, C), jnp.bfloat16)
    k = jnp.asarray(rng.randn(3, 3, C, CO) * 0.05, jnp.bfloat16)
    b = jnp.asarray(rng.randn(CO), jnp.float32)
    flops = 2 * B * H * W * 9 * C * CO
    names = sys.argv[1:] or list(VARIANTS)

    ref = None
    for n in names:
        f = VARIANTS[n]

        def body(h, _, f=f):
            o = f(h, k, b).astype(h.dtype)
            if CO != C:   # keep the dependency chain across unequal channels
                o = jnp.pad(o, ((0, 0), (0, 0), (0, 0), (0, C - CO)))
            return (h * 0.999 + o * 1e-3), ()

        run = jax.jit(lambda x0, f=f: jax.lax.scan(
            functools.partial(body, f=f), x0, None, length=STEPS)[0])
        out = run(x)
        np.asarray(out[0, 0, 0])
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = run(x)
            np.asarray(out[0, 0, 0])
            ts.append(time.perf_counter() - t0)
        per = min(ts) / STEPS
        one = np.asarray(f(x, k, b), np.float32)
        if ref is None:
            ref = one
            err = 0.0
        else:
            err = float(np.max(np.abs(one - ref)) / (np.abs(ref).max() + 1e-6))
        print(f"{n:12s}: {per*1e3:7.3f} ms  {flops/per/1e12:6.1f} T  "
              f"relerr {err:.2e}", flush=True)


if __name__ == "__main__":
    main()
