"""Same-claim A/B matrix for the r5 GLIDE attention levers.

The r5 stage-split profile (ROADMAP r5) located GLIDE's attention time in
the BASE stage (151 ms @ ~80 TF/s over 7 nq=1024 Pallas sites; SR attention
is only 24 ms), and found the cascade benches run the EXACT online-softmax
kernel — SD's serving config uses the pallas_fast raw-exp variant (identical
math below logit 88; measured −2.6 ms/step on SD). Configs, one chip claim:

  base        shipped defaults (the 2.005 img/s pin config)
  fast        attn_impl="pallas_fast" on both GLIDE UNets
  route       MDT_GLIDE_TUNE=attn_route=256 (16² tiers -> Pallas kernel)
  fast+route  both

Params are initialized ONCE (attn_impl / routing do not touch the tree).
Prints one JSON line with the fused-cascade img/s of each config.

    python benchmarks/bench_glide_attn_ab.py [batch] [runs] [configs...]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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


CONFIGS = {
    "base": (None, None),
    "fast": ("pallas_fast", None),
    "route": (None, "attn_route=256"),
    "fast+route": ("pallas_fast", "attn_route=256"),
}


def main():
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/minddiffusion_jax_cache")
    except Exception:
        pass
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    wanted = [a for a in sys.argv[3:]] or list(CONFIGS)

    from minddiffusion_tpu.pipelines import glide_cascade as gc

    m0 = gc.GlideModels.create(dtype=jnp.bfloat16)
    params = jax.jit(lambda r: m0.init_params(r))(jax.random.PRNGKey(0))
    jax.block_until_ready(params)
    log(f"params ready (batch {batch})")

    ctx = m0.base.xf_config.text_ctx
    tokens = jnp.ones((batch, ctx), jnp.int32)
    mask = jnp.ones((batch, ctx), jnp.int32)
    key = jax.random.PRNGKey(1)

    results = {}
    try:
        for tag in wanted:
            attn_impl, tune = CONFIGS[tag]
            if tune is None:
                os.environ.pop("MDT_GLIDE_TUNE", None)
            else:
                os.environ["MDT_GLIDE_TUNE"] = tune
            m = (m0 if attn_impl is None
                 else gc.GlideModels.create(dtype=jnp.bfloat16,
                                            attn_impl=attn_impl))
            fn = gc.GlideCascadePipeline(m).build_generate(batch_size=batch)
            dt = _timeit(fn, (params, tokens, mask, key), runs)
            results[f"{tag}_ms"] = round(dt * 1e3, 1)
            results[f"{tag}_img_per_s"] = round(batch / dt, 4)
            log(f"{tag}: {dt*1e3:.1f} ms  ({batch/dt:.4f} img/s)")
    finally:
        os.environ.pop("MDT_GLIDE_TUNE", None)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
