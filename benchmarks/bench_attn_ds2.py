"""ds2/ds4 self-attention block-size sweep for the packed Pallas kernel.

The SD2 512² profile shows the ds2 sites (B16, N=1024, C=640, 10 heads) run
at ~82 TFLOP/s in-program vs ~90 for the ds1 (N=4096) sites — the per-head
slice/loop overheads amortize worse at the shorter key length. This sweep
times flash_attention_packed at those shapes across block_q and the grouped
phase split, scan-amortized on the real chip. Run from the repo root.
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

from minddiffusion_tpu.ops import flash_attention  # noqa: E402

STEPS = 50


def bench(name, fn, *args):
    # k/v enter as jit ARGUMENTS (CLAUDE.md: closing arrays over jit bakes
    # them in as program constants and bloats the remote compile)
    run = jax.jit(lambda a, *rest: jax.lax.scan(
        lambda x, _: (fn(x, *rest).astype(x.dtype), ()), a, None,
        length=STEPS)[0])
    out = run(args_q, *args)
    np.asarray(out[0, 0, 0])
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = run(args_q, *args)
        np.asarray(out[0, 0, 0])
        ts.append(time.perf_counter() - t0)
    per = min(ts) / STEPS
    tf = flops / per / 1e12
    print(f"{name:34s} {per*1e3:7.3f} ms  {tf:6.1f} TF/s")
    return per


if __name__ == "__main__":
    shapes = [("ds2", 16, 1024, 640, 10), ("ds1", 16, 4096, 320, 5)]
    if len(sys.argv) > 1:
        shapes = [s for s in shapes if s[0] in sys.argv[1:]]
    for tag, b, n, c, h in shapes:
        d = c // h
        scale = d ** -0.5
        key = jax.random.PRNGKey(0)
        args_q = jax.random.normal(key, (b, n, c), jnp.bfloat16)
        k = jax.random.normal(jax.random.fold_in(key, 1), (b, n, c), jnp.bfloat16)
        v = jax.random.normal(jax.random.fold_in(key, 2), (b, n, c), jnp.bfloat16)
        flops = 4 * b * h * n * n * d
        print(f"== {tag}: B{b} N{n} C{c} h{h} ({flops/1e9:.1f} GFLOP) ==")
        for bq in (256, 512, 1024):
            if bq > n:
                continue
            for grouped in (False, True):
                def f(q, k_, v_, bq=bq, grouped=grouped):
                    return flash_attention.flash_attention_packed(
                        q, k_, v_, scale, h, block_q=bq, exact=False,
                        grouped=grouped)
                bench(f"packed bq{bq} grouped={int(grouped)}", f, k, v)
        if d == 64:
            for bq in (256, 512):
                def f(q, k_, v_, bq=bq):
                    return flash_attention.flash_attention_packed_fold(
                        q, k_, v_, scale, h, block_q=bq, exact=False)
                bench(f"fold   bq{bq}", f, k, v)
