"""Map xprof fusion names to model sites via the optimized HLO.

Lowers + compiles the SAME serving program the bench runs (so fusion
numbering matches the xprof trace), dumps the optimized HLO text, and for
every fusion prints the convolutions/dots it contains with their shapes.
Joined against op_table.py output this answers "which conv site is
fusion.6652?" — the below-cap-fusion lever-finder.

Usage (TPU, from repo root):
    python benchmarks/hlo_map.py [steps]          # dump + summarize
    python benchmarks/hlo_map.py --from-dump      # re-summarize existing dump

Writes /tmp/sd2_hlo.txt (full optimized HLO) and prints the fusion->conv
table to stdout.
"""
from __future__ import annotations

import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DUMP = "/tmp/sd2_hlo.txt"


def dump_hlo(steps: int) -> str:
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/minddiffusion_jax_cache")
    from minddiffusion_tpu.pipelines.stable_diffusion import (
        SDModels, StableDiffusionPipeline)
    from minddiffusion_tpu.utils.params import cast_serving_params

    res = int(os.environ.get("MDT_BENCH_RES", "512"))
    batch = int(os.environ.get("MDT_BENCH_BATCH", "8"))
    models = SDModels.create(family="sd2", dtype=jnp.bfloat16,
                             attn_impl="pallas_fast")
    params = jax.jit(lambda r: models.init_params(r, height=res, width=res))(
        jax.random.PRNGKey(0))
    jax.block_until_ready(params)
    params = jax.jit(cast_serving_params)(params)
    jax.block_until_ready(params)
    pipe = StableDiffusionPipeline(models)
    fn = pipe.build_txt2img(height=res, width=res, num_steps=steps,
                            sampler="ddim", guidance_scale=9.0,
                            batch_size=batch)
    tokens = jnp.ones((batch, 77), jnp.int32)
    uncond = jnp.zeros((batch, 77), jnp.int32)
    print("lowering + compiling (tunnel round-trip)...", file=sys.stderr)
    compiled = fn.lower(params, tokens, uncond, jax.random.PRNGKey(1)).compile()
    txt = compiled.as_text()
    with open(DUMP, "w") as f:
        f.write(txt)
    print(f"wrote {DUMP} ({len(txt)/1e6:.1f} MB)", file=sys.stderr)
    return txt


_SHAPE = r"(?:pred|bf16|f16|f32|f64|s8|s16|s32|s64|u8|u16|u32|u64)\[[\d,]*\]"


def summarize(txt: str) -> None:
    # Pass 1: computation headers -> {param name: shape}; bodies -> heavy ops
    comp_ops: dict[str, list[str]] = defaultdict(list)
    params: dict[str, str] = {}
    cur = None
    for line in txt.splitlines():
        m = re.match(r"^(?:ENTRY\s+)?%?([\w.\-]+)\s*\((.*)\)\s*->\s*\S+\s*\{",
                     line)
        if m:
            cur = m.group(1)
            params = {}
            for pm in re.finditer(rf"([\w.\-]+):\s*({_SHAPE})", m.group(2)):
                params[pm.group(1)] = pm.group(2)
            continue
        if line.startswith("}"):
            cur = None
            continue
        if cur is None:
            continue
        sm = re.search(
            rf"=\s*({_SHAPE})\S*\s+(convolution|dot)\(([^)]*)\)(.*)$",
            line.strip())
        if not sm:
            continue
        out_shape, kind, args, rest = sm.groups()
        opnames = [a.strip().lstrip("%") for a in args.split(",")]
        opshapes = [params.get(n, params.get(n.split(".")[0], "?"))
                    for n in opnames]
        win = (re.search(r"window=\{([^}]*)\}", rest) or [None, ""])[1]
        dn = (re.search(r"dim_labels=([^,\s]+)", rest) or [None, ""])[1]
        op_name = (re.search(r'op_name="([^"]*)"', rest) or [None, ""])[1]
        # keep the tail of the op_name path — the flax module site
        site = "/".join(op_name.split("/")[-4:]) if op_name else ""
        comp_ops[cur].append(
            f"{kind} {' x '.join(opshapes)} -> {out_shape}"
            + (f"  win={win}" if win else "")
            + (f"  {dn}" if dn else "") + (f"  @{site}" if site else ""))

    # Pass 2: fusion instructions -> called computation -> print
    printed = 0
    for line in txt.splitlines():
        m = re.search(
            r"%?([\w.\-]+)\s*=\s*\S+\s+fusion\(.*calls=%?([\w.\-]+)", line)
        if not m:
            continue
        name, callee = m.groups()
        ops = comp_ops.get(callee)
        if not ops:
            continue
        for op in ops:
            print(f"{name:44s} {op}")
        printed += 1
    # non-fused convs/dots in the entry/while bodies too
    print(f"\n{printed} fusions with conv/dot roots "
          f"(join the first column against op_table names)", file=sys.stderr)


def main():
    if "--from-dump" in sys.argv:
        txt = open(DUMP).read()
    else:
        steps = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 50
        txt = dump_hlo(steps)
    summarize(txt)


if __name__ == "__main__":
    main()
