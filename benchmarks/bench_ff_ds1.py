"""LN->GEGLU-FF->residual at the ds1 site (B16 N4096 C320): XLA composition
vs the fused Pallas kernel at several (block_rows, subtiles) points.

The single-chain fused kernel loses e2e because its VPU work (LN, gelu)
serializes against the MXU matmuls, while XLA pipelines them across fusion
blocks. subtiles>1 gives Mosaic independent sub-chains to overlap.
Run from the repo root on TPU.
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

import sys as _sys
_sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "research"))
from fused_ff import _ff_reference, fused_ln_geglu_ff  # noqa: E402

STEPS = 20
B, N, C = 16, 4096, 320
F = 4 * C


def timed(fn, *args):
    def body(h, _):
        y = fn(h, *args)
        return y.astype(h.dtype), ()

    run = jax.jit(lambda x0: jax.lax.scan(body, x0, None, length=STEPS)[0])
    x0 = args_x
    out = run(x0)
    np.asarray(out[0, 0, 0])
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = run(x0)
        np.asarray(out[0, 0, 0])
        ts.append(time.perf_counter() - t0)
    return min(ts) / STEPS


def main():
    global args_x
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    args_x = jax.random.normal(ks[0], (B, N, C), jnp.bfloat16)
    s = jax.random.normal(ks[1], (C,), jnp.float32) * 0.1 + 1
    t = jax.random.normal(ks[2], (C,), jnp.float32) * 0.1
    w1 = (jax.random.normal(ks[3], (C, 2 * F), jnp.float32) * 0.02).astype(jnp.bfloat16)
    b1 = jnp.zeros((2 * F,), jnp.float32)
    w2 = (jax.random.normal(ks[4], (F, C), jnp.float32) * 0.02).astype(jnp.bfloat16)
    b2 = jnp.zeros((C,), jnp.float32)

    ms = timed(lambda x: _ff_reference(x, s, t, w1, b1, w2, b2, 1e-5))
    print(f"xla composition: {ms*1e3:.3f} ms", flush=True)
    for br, st_ in [(256, 1), (256, 2), (512, 2), (512, 4), (1024, 4), (1024, 8)]:
        ms = timed(lambda x, br=br, st_=st_: fused_ln_geglu_ff(
            x, s, t, w1, b1, w2, b2, block_rows=br, subtiles=st_))
        print(f"fused br={br} subtiles={st_}: {ms*1e3:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
