"""XLA-TPU compiler-option sweep on the headline e2e program.

Compiles the SD2 512² DDIM-50 b8 txt2img program once per option set (via
``jitted.lower(...).compile(compiler_options=...)``) and times 2 steady-state
runs each. Option names were mined from the local libtpu binary; anything the
remote compiler rejects is caught and reported, not fatal.

Usage: python benchmarks/bench_flags.py [variant ...]
(no args = run the default candidate list; names below)
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

from minddiffusion_tpu.pipelines.stable_diffusion import SDModels, StableDiffusionPipeline  # noqa: E402
from minddiffusion_tpu.utils.params import cast_serving_params  # noqa: E402

VARIANTS: dict[str, dict[str, str]] = {
    "baseline": {},
    "layout_negotiation": {"xla_tpu_allow_layout_negotiation": "true"},
    "loop_fusion_layout": {"xla_tpu_enable_aggressive_loop_fusion_layout_opt": "true"},
    "licm8": {"xla_tpu_licm_size_inflation_ratio": "8"},
    "copy_permute_minor": {"xla_tpu_enable_copy_permute_minor_fusion": "true"},
    "exp_fusion_cost": {"xla_tpu_enable_experimental_fusion_cost_model": "true"},
    "exp_scheduler": {"xla_tpu_enable_all_experimental_scheduler_features": "true"},
    "pipelined_unroll": {"xla_tpu_enable_pipelined_loop_unrolling": "true"},
    "vmem_dmas": {"xla_tpu_enable_vmem_to_vmem_dmas": "true"},
    "nested_dot_fusion": {
        "xla_tpu_enable_multi_level_nested_dot_fusion": "true",
        "xla_tpu_enable_multi_level_input_dot_dot_fusion": "true",
        "xla_tpu_enable_multi_level_output_dot_dot_fusion": "true",
    },
    "untiled_layout": {"xla_tpu_enable_untiled_layout": "true"},
    "ilp_scheduler": {"xla_tpu_enable_ilp_latency_hiding_scheduler": "true"},
    "rwb_fusion": {"xla_tpu_rwb_fusion": "true"},
    "autotune_layouts": {"xla_tpu_autotune_layouts": "true"},
    # wave 2 — run explicitly by name: bench_flags.py x8_conv lp_llo ...
    "x8_conv": {"xla_tpu_fuse_non_trivial_x8_producers_into_conv_like": "true"},
    "lp_llo": {"xla_tpu_consider_lp_llo_scheduler": "true"},
    "copy_elision": {"xla_tpu_copy_elision_analysis_allowance": "100000"},
    "copy_region": {"xla_tpu_copy_insertion_use_region_analysis": "true"},
    "licm2": {"xla_tpu_licm_size_inflation_ratio": "2"},
    "cond_motion": {"xla_tpu_conditional_code_motion_allowance": "100000"},
}
WAVE2 = ("x8_conv", "lp_llo", "copy_elision", "copy_region", "licm2",
         "cond_motion")


def main():
    names = [a for a in sys.argv[1:] if not a.startswith("--")] or [
        n for n in VARIANTS if n not in WAVE2]
    unknown = [n for n in names if n not in VARIANTS]
    if unknown:  # fail BEFORE hours of compiles, not mid-sweep
        sys.exit(f"unknown variant(s): {unknown}; known: {list(VARIANTS)}")
    models = SDModels.create(family="sd2", dtype=jnp.bfloat16,
                             attn_impl="pallas_fast")
    params = jax.jit(lambda r: models.init_params(r, height=512, width=512))(
        jax.random.PRNGKey(0))
    params = jax.jit(cast_serving_params)(params)
    jax.block_until_ready(params)

    pipe = StableDiffusionPipeline(models)
    fn = pipe.build_txt2img(height=512, width=512, num_steps=50,
                            sampler="ddim", guidance_scale=9.0, batch_size=8)
    tokens = jnp.ones((8, 77), jnp.int32)
    uncond = jnp.zeros((8, 77), jnp.int32)
    key = jax.random.PRNGKey(1)
    lowered = fn.lower(params, tokens, uncond, key)

    results = []
    for name in names:
        opts = VARIANTS[name]
        t0 = time.time()
        try:
            compiled = lowered.compile(compiler_options=opts) if opts else \
                lowered.compile()
        except Exception as e:  # noqa: BLE001 — report and continue the sweep
            print(f"[{name}] COMPILE FAILED: {str(e)[:300]}", flush=True)
            continue
        t_compile = time.time() - t0
        img = compiled(params, tokens, uncond, key)
        np.asarray(img[0, 0, 0])
        times = []
        for i in range(2):
            t0 = time.time()
            img = compiled(params, tokens, uncond, jax.random.PRNGKey(2 + i))
            np.asarray(img[0, 0, 0])
            times.append(time.time() - t0)
        best = 8 / min(times)
        results.append((best, name))
        print(f"[{name}] {best:.3f} img/s (runs {[f'{t:.3f}' for t in times]}, "
              f"compile {t_compile:.0f}s)", flush=True)

    print("\n=== sorted ===")
    for best, name in sorted(results, reverse=True):
        print(f"{best:.3f}  {name}")


if __name__ == "__main__":
    main()
