"""STATUS: HISTORICAL — the A/B this ran is closed (r4i: tail=1 1.9931 vs
2.0064 baseline, LOSS −26.5 ms/cascade; see research/glide_tail.py). The
MDT_GLIDE_TUNE=tail flag and the pipeline's fused-tail branch were removed
with the r5 retirement, so the tail=1 leg of this script NO LONGER ENGAGES
the kernel — re-running it requires restoring the glide_cascade hook from
git history (commit 352d14a). Kept as the measurement record.

Same-session A/B of the fused Pallas GLIDE SR sampler tail (r4h kernel).

One chip claim, two programs: the shipped cascade (direct out_conv inside
the SR DDIM loop) vs MDT_GLIDE_TUNE=tail=1 (GN + SiLU + taps-in-N out_conv
+ DDIM step math fused in ops/glide_tail — zero tiny-channel
materializations). Prints ONE JSON line with both fused-cascade times.

    python benchmarks/research/bench_glide_tail_ab.py [batch] [runs]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

import jax
import jax.numpy as jnp


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def _timeit(fn, args, runs):
    out = fn(*args)
    jax.block_until_ready(out)
    times = []
    for _ in range(runs):
        t0 = time.time()
        jax.block_until_ready(fn(*args))
        times.append(time.time() - t0)
    return min(times)


def main():
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/minddiffusion_jax_cache")
    except Exception:
        pass
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from minddiffusion_tpu.pipelines import glide_cascade as gc

    m = gc.GlideModels.create(dtype=jnp.bfloat16)
    params = jax.jit(lambda r: m.init_params(r))(jax.random.PRNGKey(0))
    jax.block_until_ready(params)
    log(f"params ready (batch {batch})")

    ctx = m.base.xf_config.text_ctx
    tokens = jnp.ones((batch, ctx), jnp.int32)
    mask = jnp.ones((batch, ctx), jnp.int32)
    key = jax.random.PRNGKey(1)

    results = {}
    try:
        for tag, env in (("base", None), ("tail", "tail=1")):
            if env is None:
                os.environ.pop("MDT_GLIDE_TUNE", None)
            else:
                os.environ["MDT_GLIDE_TUNE"] = env
            # fresh build => fresh jit closure; flags() re-resolves on change
            fn = gc.GlideCascadePipeline(m).build_generate(batch_size=batch)
            dt = _timeit(fn, (params, tokens, mask, key), runs)
            results[f"{tag}_ms"] = round(dt * 1e3, 1)
            results[f"{tag}_img_per_s"] = round(batch / dt, 4)
            log(f"{tag}: {dt*1e3:.1f} ms  ({batch/dt:.4f} img/s)")
    finally:
        # an exception mid-A/B must not leave the flag set for later code
        os.environ.pop("MDT_GLIDE_TUNE", None)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
