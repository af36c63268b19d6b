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
    # wave 3 (r4, mined from libtpu 0.0.34; shipped base now includes licm2
    # via xla_opts.SHIPPED, so each is measured ON TOP of licm2)
    "dc_convert": {"xla_tpu_licm_size_inflation_ratio": "2",
                   "xla_tpu_allow_conv_input_fusion_with_downcast_convert": "true"},
    "x16_2ndminor": {"xla_tpu_licm_size_inflation_ratio": "2",
                     "xla_tpu_enable_large_2nd_minor_layout_for_x16": "true",
                     "xla_tpu_allow_large_2nd_minor_layout_for_x16": "true"},
    "reduce_input_fusion": {"xla_tpu_licm_size_inflation_ratio": "2",
                            "xla_tpu_allow_input_fusion_in_certain_reduce_ops": "true"},
    "reduce_rwb": {"xla_tpu_licm_size_inflation_ratio": "2",
                   "xla_tpu_allow_multi_dim_reduce_rwb": "true"},
    "sublane_bitcast": {"xla_tpu_licm_size_inflation_ratio": "2",
                        "xla_tpu_enable_sublane_major_scaling_bitcast_fusion": "true"},
    "layer_sched": {"xla_tpu_licm_size_inflation_ratio": "2",
                    "xla_tpu_enable_latency_hiding_layer_scheduler": "true"},
    "overlap_layer": {"xla_tpu_licm_size_inflation_ratio": "2",
                      "xla_tpu_enable_multi_compute_overlap_in_layer_scheduler": "true"},
    "copy_fusion_split": {"xla_tpu_licm_size_inflation_ratio": "2",
                          "xla_tpu_copy_fusion_allow_split": "true"},
    "scavenge_vmem": {"xla_tpu_licm_size_inflation_ratio": "2",
                      "xla_tpu_override_scavenge_vmem_for_fusions": "true"},
    "autotune_dots": {"xla_tpu_licm_size_inflation_ratio": "2",
                      "xla_tpu_autotune_dots": "true"},
    "autotune_windows": {"xla_tpu_licm_size_inflation_ratio": "2",
                         "xla_tpu_autotune_windows": "true"},
    "licm2_pin": {"xla_tpu_licm_size_inflation_ratio": "2"},
}
WAVE2 = ("x8_conv", "lp_llo", "copy_elision", "copy_region", "licm2",
         "cond_motion")
WAVE3 = ("licm2_pin", "dc_convert", "x16_2ndminor", "reduce_input_fusion",
         "reduce_rwb", "sublane_bitcast", "layer_sched", "overlap_layer",
         "copy_fusion_split", "scavenge_vmem", "autotune_dots",
         "autotune_windows")


def main():
    if sys.argv[1:] == ["wave3"]:
        names = list(WAVE3)
    else:
        names = [a for a in sys.argv[1:] if not a.startswith("--")] or [
            n for n in VARIANTS if n not in WAVE2 and n not in WAVE3]
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
