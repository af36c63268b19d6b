"""UNet-step shootout: times ONE denoiser apply (the unit that runs 50x per
image batch), scan-amortized on the real TPU, for a set of kernel configs.

Usage: python benchmarks/bench_unet_step.py [config ...]
Configs: baseline | ones | fast | fuse_ff | fuse_ff_fast | einsum | b32
(no args = all). Each prints ms/step and effective TFLOP/s against the
compiled-flops count (12.55 TFLOP at CFG batch 16).
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

STEPS = 50


def run_config(name: str, env: dict, attn_impl, batch: int = 16) -> float:
    for k, v in env.items():
        os.environ[k] = v
    try:
        from minddiffusion_tpu.models.unet import UNetConfig, UNetModel

        cfg = UNetConfig.sd2(dtype=jnp.bfloat16, attn_impl=attn_impl)
        model = UNetModel(cfg)
        x = jnp.zeros((batch, 64, 64, 4), jnp.bfloat16)
        t = jnp.zeros((batch,), jnp.int32)
        ctx = jnp.zeros((batch, 77, 1024), jnp.bfloat16)
        shapes = jax.eval_shape(
            lambda: model.init(jax.random.PRNGKey(0), x, t, ctx))
        params = jax.tree.map(lambda s: jnp.full(s.shape, 1e-3, s.dtype), shapes)

        # params as a jit ARG, not a closure constant: closing over them
        # bakes ~3.5 GB of constants into the program and makes remote
        # compiles pathological (see ROADMAP "Known-broken / deferred")
        def run_(p, x0):
            def body(h, _):
                eps = model.apply(p, h, t, ctx)
                return eps.astype(h.dtype), ()

            return jax.lax.scan(body, x0, None, length=STEPS)[0]

        run_j = jax.jit(run_)
        run = lambda x0: run_j(params, x0)
        out = run(x)
        np.asarray(out[0, 0, 0])
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = run(x)
            np.asarray(out[0, 0, 0])
            ts.append(time.perf_counter() - t0)
        per_step = min(ts) / STEPS
        if os.environ.get("MDT_TRACE"):
            _trace_breakdown(run, x, per_step)
        flops = 12.55e12 * batch / 16
        print(f"{name:14s} b{batch}: {per_step*1e3:7.2f} ms/step "
              f"({flops/per_step/1e12:6.1f} T eff)", flush=True)
        return per_step
    finally:
        for k in env:
            os.environ.pop(k, None)


def _trace_breakdown(run, x, per_step):
    """Trace one run and print per-op-group ms/step (share * measured step)."""
    import collections
    import glob
    import json

    os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
    trace_dir = "/tmp/unet_step_trace"
    os.system(f"rm -rf {trace_dir}")
    jax.profiler.start_trace(trace_dir)
    out = run(x)
    np.asarray(out[0, 0, 0])
    jax.profiler.stop_trace()
    pbs = glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)
    from xprof.convert import raw_to_tool_data

    data, _ = raw_to_tool_data.xspace_to_tool_data(pbs, "op_profile", {})
    prof = json.loads(data) if isinstance(data, (str, bytes)) else data

    acc = []

    def walk(node, acc):
        ch = node.get("children", [])
        if not ch:
            m = node.get("metrics", {})
            acc.append((m.get("rawTime", m.get("time", 0.0)),
                        node.get("name", "?")))
        for c in ch:
            walk(c, acc)

    walk(prof.get("byCategory") or prof.get("byProgram") or prof, acc)
    total = sum(t for t, _ in acc) or 1.0
    groups = collections.defaultdict(float)
    for t, name in acc:
        base = name.split(".")[0]
        groups[base] += t
    print(f"  -- op groups (ms/step of {per_step*1e3:.2f}):")
    for g, t in sorted(groups.items(), key=lambda kv: -kv[1])[:18]:
        print(f"  {t/total*per_step*1e3:7.2f} ms  {t/total*100:5.1f}%  {g}")


CONFIGS = {
    "baseline": (dict(MDT_FUSE_FF="0", MDT_ONES_ATTN="0", MDT_WINO="0"), None, 16),
    "ones": (dict(MDT_FUSE_FF="0", MDT_ONES_ATTN="1", MDT_WINO="0"), None, 16),
    "fast": (dict(MDT_FUSE_FF="0", MDT_WINO="0"), "pallas_fast", 16),
    "fuse_ff": (dict(MDT_FUSE_FF="1", MDT_ONES_ATTN="0", MDT_WINO="0"), None, 16),
    "fuse_ff_fast": (dict(MDT_FUSE_FF="1", MDT_WINO="0"), "pallas_fast", 16),
    "einsum": (dict(MDT_FUSE_FF="0", MDT_ONES_ATTN="0", MDT_WINO="0"), "xla", 16),
    "b32": (dict(MDT_FUSE_FF="0", MDT_ONES_ATTN="0", MDT_WINO="0"), None, 32),
    "wino": (dict(MDT_FUSE_FF="0", MDT_ONES_ATTN="0", MDT_WINO="1"), None, 16),
    "wino_fast": (dict(MDT_FUSE_FF="0", MDT_WINO="1"), "pallas_fast", 16),
    "fold_fast": (dict(MDT_FUSE_FF="0", MDT_WINO="1", MDT_FOLD_ATTN="1"),
                  "pallas_fast", 16),
    "gnb_fast": (dict(MDT_FUSE_FF="0", MDT_WINO="1", MDT_GN_BARRIER="1"),
                 "pallas_fast", 16),
    "split_fast": (dict(MDT_FUSE_FF="0", MDT_WINO="1", MDT_SPLIT_CONCAT="1"),
                   "pallas_fast", 16),
    "noproj_fast": (dict(MDT_FUSE_FF="0", MDT_WINO="1", MDT_PROJ_ATTN="0"),
                    "pallas_fast", 16),
    # ds1-only FF fusion (N>=4096 sites, BW-bound down-proj) on the shipped set
    "ffds1_fast": (dict(MDT_FUSE_FF="ds1", MDT_WINO="1"), "pallas_fast", 16),
    # GN-stat barrier incl. the split-resblock path (up_0_0 mega-fusion)
    "gnbs_fast": (dict(MDT_FUSE_FF="0", MDT_WINO="1", MDT_GN_BARRIER="1"),
                  "pallas_fast", 16),
    # flatten 3D dots only at the N>=4096 ds1 sites
    "d2d_ds1_fast": (dict(MDT_FUSE_FF="0", MDT_WINO="1", MDT_DENSE2D="ds1"),
                     "pallas_fast", 16),
}


def main():
    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    names = sys.argv[1:] or list(CONFIGS)
    for n in names:
        env, impl, batch = CONFIGS[n]
        run_config(n, env, impl, batch)


if __name__ == "__main__":
    main()
