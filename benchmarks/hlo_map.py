"""Map xprof fusion names to model sites via the optimized HLO.

Lowers + compiles the SAME serving program the bench runs (so fusion
numbering matches the xprof trace), dumps the optimized HLO text, and for
every fusion prints the convolutions/dots it contains with their shapes.
Joined against op_table.py output this answers "which conv site is
fusion.6652?" — the below-cap-fusion lever-finder.

Usage (TPU, from repo root):
    python benchmarks/hlo_map.py [steps]            # SD2: dump + summarize
    python benchmarks/hlo_map.py --family glide     # GLIDE cascade program
    python benchmarks/hlo_map.py --from-dump        # re-summarize existing dump
    python benchmarks/hlo_map.py --from-dump --find fusion.3491[,more]
                                                    # print full fusion bodies

Writes /tmp/{sd2,glide}_hlo.txt (full optimized HLO) and prints the
fusion->conv table (or the requested fusion bodies) to stdout.
"""
from __future__ import annotations

import os
import re
import sys
from collections import defaultdict


sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _dump_path(family: str) -> str:
    return f"/tmp/{family}_hlo.txt"


def dump_hlo_sd2(steps: int) -> str:
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
    return compiled.as_text()


def dump_hlo_glide(batch: int = 8) -> str:
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/minddiffusion_jax_cache")
    from minddiffusion_tpu.pipelines import glide_cascade as gc

    m = gc.GlideModels.create(dtype=jnp.bfloat16)
    params = jax.jit(lambda r: m.init_params(r))(jax.random.PRNGKey(0))
    jax.block_until_ready(params)
    ctx = m.base.xf_config.text_ctx
    tokens = jnp.ones((batch, ctx), jnp.int32)
    mask = jnp.ones((batch, ctx), jnp.int32)
    fn = gc.GlideCascadePipeline(m).build_generate(batch_size=batch)
    print("lowering + compiling (tunnel round-trip)...", file=sys.stderr)
    compiled = fn.lower(params, tokens, mask, jax.random.PRNGKey(1)).compile()
    return compiled.as_text()


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

    # Pass 2: fusion instructions -> called computation -> print.
    # NB: tuple-output fusions (conv + GroupNorm stat reduces, xprof's
    # convert_reduce_fusion class) have `= (f32[...], ...) fusion(`-style
    # result types with spaces — match lazily up to ` fusion(`.
    printed = 0
    for line in txt.splitlines():
        m = re.search(
            r"%?([\w.\-]+)\s*=\s*.+?\s+fusion\(.*calls=%?([\w.\-]+)", line)
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


def find_fusions(txt: str, names: list[str]) -> None:
    """Print the instruction line + full called-computation body for each
    named fusion (xprof names like fusion.3491 / convert_reduce_fusion.745).
    """
    lines = txt.splitlines()
    # index computations by name -> (start, end) line range
    comp_range: dict[str, tuple[int, int]] = {}
    cur, start = None, 0
    for i, line in enumerate(lines):
        m = re.match(r"^(?:ENTRY\s+)?%?([\w.\-]+)\s*\(.*\)\s*->\s*\S+\s*\{",
                     line)
        if m:
            cur, start = m.group(1), i
        elif line.startswith("}") and cur is not None:
            comp_range[cur] = (start, i + 1)
            cur = None
    for want in names:
        pat = re.compile(rf"%{re.escape(want)}\s*=\s*.+?\s+fusion\(")
        hits = [i for i, l in enumerate(lines) if pat.search(l)]
        if not hits:
            print(f"=== {want}: NOT FOUND ===")
            continue
        for i in hits:
            print(f"=== {want} (instruction) ===")
            print(lines[i].strip()[:2000])
            m = re.search(r"calls=%?([\w.\-]+)", lines[i])
            if m and m.group(1) in comp_range:
                a, b = comp_range[m.group(1)]
                print(f"--- body {m.group(1)} ({b-a} lines) ---")
                for l in lines[a:b]:
                    print(l.rstrip()[:400])
            print()


def main():
    family = "glide" if "--family" in sys.argv and \
        sys.argv[sys.argv.index("--family") + 1] == "glide" else "sd2"
    if "--from-dump" in sys.argv:
        txt = open(_dump_path(family)).read()
    else:
        if family == "glide":
            txt = dump_hlo_glide()
        else:
            steps = next((int(a) for a in sys.argv[1:] if a.isdigit()), 50)
            txt = dump_hlo_sd2(steps)
        with open(_dump_path(family), "w") as f:
            f.write(txt)
        print(f"wrote {_dump_path(family)} ({len(txt)/1e6:.1f} MB)",
              file=sys.stderr)
    if "--find" in sys.argv:
        names = sys.argv[sys.argv.index("--find") + 1].split(",")
        find_fusions(txt, names)
    else:
        summarize(txt)


if __name__ == "__main__":
    main()
