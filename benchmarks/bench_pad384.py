"""Probe: does lane-aligning the ds1 level (320 -> 384 channels, zero-padded)
pay for its 1.44x conv FLOPs / 1.2x matmul K on v5e?

320 = 2.5 x 128 lanes: xprof shows in-program ds1 convs at 75-93 TF/s vs
166-185 for the aligned 640/1280 levels. If a 384-wide conv runs at the
aligned-peer rate, padded-but-aligned beats exact-but-misaligned even with
the extra zero FLOPs. Scan-timed, b16 (CFG batch), bf16.
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


def timed(make_fn, x):
    def body(h, _):
        y = make_fn(h)
        return y.astype(h.dtype), ()

    run = jax.jit(lambda x0: jax.lax.scan(body, x0, None, length=STEPS)[0])
    out = run(x)
    np.asarray(out.reshape(-1)[0])
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = run(x)
        np.asarray(out.reshape(-1)[0])
        ts.append(time.perf_counter() - t0)
    return min(ts) / STEPS


def main():
    key = jax.random.PRNGKey(0)
    for c in (320, 384):
        k = (jax.random.normal(key, (3, 3, c, c), jnp.float32) * 0.02).astype(jnp.bfloat16)
        x = jax.random.normal(key, (16, 64, 64, c), jnp.bfloat16)
        ms = timed(lambda h, k=k: jax.lax.conv_general_dilated(
            h, k, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC")), x)
        gflop = 2 * 16 * 64 * 64 * c * c * 9 / 1e9
        print(f"conv 64^2 {c}->{c}: {ms*1e3:.3f} ms  ({gflop/ms/1e3:.0f} TF/s)",
              flush=True)
    for cin, cout in ((320, 2560), (384, 2560), (2560, 320), (2560, 384)):
        w = (jax.random.normal(key, (cin, cout), jnp.float32) * 0.02).astype(jnp.bfloat16)
        x = jax.random.normal(key, (16, 4096, cin), jnp.bfloat16)

        def mm(h, w=w, cin=cin):
            y = jnp.einsum("bnc,cd->bnd", h, w,
                           preferred_element_type=jnp.float32).astype(h.dtype)
            # keep the carry shape: project back to cin with a slice/pad
            return y[..., :cin] if y.shape[-1] >= cin else jnp.pad(
                y, ((0, 0), (0, 0), (0, cin - y.shape[-1])))

        ms = timed(mm, x)
        gflop = 2 * 16 * 4096 * cin * cout / 1e9
        print(f"matmul (16,4096,{cin})@({cin},{cout}): {ms*1e3:.3f} ms "
              f"({gflop/ms/1e3:.0f} TF/s)", flush=True)


if __name__ == "__main__":
    main()
