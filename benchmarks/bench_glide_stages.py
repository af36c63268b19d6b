"""Per-stage timing of the GLIDE cascade (VERDICT r3 item 5).

The cascade headline (1.95 img/s to 1024px, b8) is one fused program; this
script jits each stage as its OWN program to locate the time:

  xf      — text transformer, cond+uncond (2B, 128)
  base    — 60-step ancestral 64² CFG loop (xf hoisted, per_generation mode)
  sr      — 27-step DDIM 256² loop (low-res concat, no CFG)
  srgan   — one fp32 x4 upsampler apply (256² -> 1024²)

Stage sums will exceed the fused-cascade wall slightly (extra dispatch +
lost inter-stage overlap); use the RELATIVE split to rank levers.

    python benchmarks/bench_glide_stages.py [batch] [profile]

`profile` additionally captures an xprof trace of the full cascade to
/tmp/glide_profile (inspect with benchmarks/op_table.py after converting,
or read the trace in xprof).
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def _timeit(fn, args, runs=3):
    out = fn(*args)
    jax.block_until_ready(out)
    times = []
    for _ in range(runs):
        t0 = time.time()
        jax.block_until_ready(fn(*args))
        times.append(time.time() - t0)
    return min(times), out


def main():
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/minddiffusion_jax_cache")
    except Exception:
        pass
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    do_profile = "profile" in sys.argv[1:]

    from minddiffusion_tpu.pipelines import glide_cascade as gc
    from minddiffusion_tpu.samplers import ancestral
    from minddiffusion_tpu.utils import xla_opts

    # serving config (r5b: pallas_fast 2.0189 vs exact 2.0030 same-claim)
    m = gc.GlideModels.create(dtype=jnp.bfloat16, attn_impl="pallas_fast")
    params = jax.jit(lambda r: m.init_params(r))(jax.random.PRNGKey(0))
    jax.block_until_ready(params)
    log(f"params ready (batch {batch})")

    ctx = m.base.xf_config.text_ctx
    vocab = m.base.xf_config.n_vocab
    tokens = jnp.ones((batch, ctx), jnp.int32)
    mask = jnp.ones((batch, ctx), jnp.int32)
    key = jax.random.PRNGKey(1)
    scale = 5.0

    # ---- stage: xf text encode (cond + uncond, 2B rows) ----
    @xla_opts.jit
    def xf_stage(params, tok2, mask2):
        return m.base.apply(params["base"], tok2, mask2,
                            method=m.base.encode_text)

    unc = jax.random.randint(key, (batch, ctx), 1, vocab - 1, jnp.int32)
    tok2 = jnp.concatenate([tokens, unc], axis=0)
    mask2 = jnp.concatenate([mask, jnp.ones_like(mask)], axis=0)
    dt, (xf_proj2, xf_out2) = _timeit(xf_stage, (params, tok2, mask2))
    results = {"xf_ms": dt * 1e3}
    log(f"xf encode (2x{batch}): {dt*1e3:.1f} ms")

    # ---- stage: base 64² ancestral CFG loop ----
    base_size = 64

    @xla_opts.jit
    def base_stage(params, xf_proj2, xf_out2, key):
        base_vars = gc._hoist_invariants(
            m.base, params["base"],
            (jnp.zeros((2 * batch, base_size, base_size, 3)),
             jnp.zeros((2 * batch,), jnp.int32), xf_proj2, xf_out2),
            m.base.denoise)

        def model_fn(x, t_orig):
            x2 = jnp.concatenate([x, x], axis=0)
            t2 = (t_orig if t_orig.shape[0] == 1
                  else jnp.concatenate([t_orig, t_orig], axis=0))
            eps2, v2 = m.base.apply(base_vars, x2, t2, xf_proj2, xf_out2,
                                    method=m.base.denoise)
            eps_c, eps_u = jnp.split(eps2, 2, axis=0)
            eps = eps_u + scale * (eps_c - eps_u)
            v_c, _ = jnp.split(v2, 2, axis=0)
            return eps, v_c

        k1, k2 = jax.random.split(key)
        x_T = jax.random.normal(k1, (batch, base_size, base_size, 3),
                                jnp.float32)
        return ancestral.p_sample_loop(model_fn, x_T, m.base_schedule, key=k2)

    dt, img64 = _timeit(base_stage, (params, xf_proj2, xf_out2, key))
    results["base_ms"] = dt * 1e3
    n_base = m.base_schedule.num_timesteps
    log(f"base stage ({n_base} steps, 64² CFG): {dt*1e3:.1f} ms"
        f"  ({dt*1e3/n_base:.2f} ms/step)")

    # ---- stage: super-res 256² DDIM loop ----
    sr_size = 256

    @xla_opts.jit
    def sr_stage(params, tokens, mask, img64, key):
        low_res = gc.quantize_roundtrip(img64)
        xf_proj_s, xf_out_s = m.super_res.apply(
            params["super_res"], tokens, mask, method=m.super_res.encode_text)
        sr_vars = gc._hoist_invariants(
            m.super_res, params["super_res"],
            (jnp.zeros((batch, sr_size, sr_size, 3)),
             jnp.zeros((batch,), jnp.int32), low_res, xf_proj_s, xf_out_s),
            m.super_res.denoise)

        def model_fn(x, t_orig):
            return m.super_res.apply(sr_vars, x, t_orig, low_res,
                                     xf_proj_s, xf_out_s,
                                     method=m.super_res.denoise)

        x_T = 0.997 * jax.random.normal(key, (batch, sr_size, sr_size, 3),
                                        jnp.float32)
        return ancestral.ddim_sample_loop(model_fn, x_T, m.sr_schedule)

    dt, img256 = _timeit(sr_stage, (params, tokens, mask, img64, key))
    results["sr_ms"] = dt * 1e3
    n_sr = m.sr_schedule.num_timesteps
    log(f"sr stage ({n_sr} steps, 256²): {dt*1e3:.1f} ms"
        f"  ({dt*1e3/n_sr:.2f} ms/step)")

    # ---- stage: SRGAN x4 ----
    if m.srgan is not None:
        @xla_opts.jit
        def srgan_stage(params, img256):
            return m.srgan.apply(params["srgan"],
                                 jnp.clip(img256, -1.0, 1.0).astype(jnp.float32))

        dt, _ = _timeit(srgan_stage, (params, img256))
        results["srgan_ms"] = dt * 1e3
        log(f"srgan x4 (256²->1024²): {dt*1e3:.1f} ms")

    # ---- fused cascade reference number ----
    fn = gc.GlideCascadePipeline(m).build_generate(batch_size=batch)
    dt, _ = _timeit(fn, (params, tokens, mask, key))
    results["cascade_ms"] = dt * 1e3
    results["cascade_img_per_s"] = batch / dt
    log(f"fused cascade: {dt*1e3:.1f} ms  ({batch/dt:.3f} img/s)")

    if do_profile:
        os.system("rm -rf /tmp/glide_profile")
        os.makedirs("/tmp/glide_profile", exist_ok=True)
        with jax.profiler.trace("/tmp/glide_profile"):
            jax.block_until_ready(fn(params, tokens, mask, key))
        log("xprof trace written to /tmp/glide_profile")
        from xprof_util import trace_to_op_profile
        trace_to_op_profile("/tmp/glide_profile", "/tmp/glide_op_profile.json")
        log("summarize with: python benchmarks/op_table.py "
            "/tmp/glide_op_profile.json")

    print(json.dumps({k: round(v, 2) for k, v in results.items()}))


if __name__ == "__main__":
    main()
