"""Serve txt2img over HTTP with TPU micro-batching.

Examples:
    python -m minddiffusion_tpu.cli.serve --family sd2 --ckpt sd2.safetensors \
        --height 512 --width 512 --steps 50 --batch_size 8 --port 8000
    python -m minddiffusion_tpu.cli.serve --family glide --ckpt glide_orbax/ \
        --tokenizer_model cog-pretrain.model --batch_size 8

POST /v1/txt2img {"prompt": "...", "seed": 42} -> PNG (base64). The engine
pads partial batches onto the one compiled program, so tail latency at low
traffic equals one batch time; throughput at saturation equals the driver
bench (it is the same program). Per-request determinism: (prompt, seed) ->
the same image regardless of batch composition (SD: explicit x_T noise;
GLIDE: row_seeds). No reference analogue — the reference's only entry point
is the one-shot CLI (stablediffusionv2/txt2img.py:66-287).
"""
from __future__ import annotations

import argparse

import jax


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--family", default="sd2",
                   choices=["sd2", "wukong", "glide"])
    p.add_argument("--ckpt", default=None, help="orbax dir / .safetensors / "
                   ".ckpt (torch or MindSpore); random init if omitted")
    p.add_argument("--height", type=int, default=512)
    p.add_argument("--width", type=int, default=512)
    p.add_argument("--steps", type=int, default=50,
                   help="SD sampler steps (GLIDE uses --denoise_steps)")
    p.add_argument("--sampler", default="ddim",
                   choices=["ddim", "plms", "dpm"])
    p.add_argument("--scale", type=float, default=9.0)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--max_wait_ms", type=float, default=25.0)
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--dtype", default="bf16", choices=["bf16", "fp32"])
    p.add_argument("--debug_tiny", action="store_true")
    # GLIDE-only knobs (mirroring cli/glide_txt2img.py)
    p.add_argument("--tokenizer_model", default=None,
                   help="GLIDE zh sentencepiece model (cog-pretrain.model)")
    p.add_argument("--denoise_steps", default="60")
    p.add_argument("--super_res_steps", default="fast27")
    p.add_argument("--no_srgan", action="store_true")
    p.add_argument("--glide_scale", type=float, default=5.0)
    return p


def _build_sd_engine(args):
    from minddiffusion_tpu.cli.common import build_sd, load_params, tokenizer_for
    from minddiffusion_tpu.pipelines.stable_diffusion import StableDiffusionPipeline
    from minddiffusion_tpu.serving import BatchingEngine, SDAdapter

    models = build_sd(args.family, args.dtype, tiny=args.debug_tiny)
    params = load_params(models, args.ckpt, args.height, args.width)
    if args.dtype == "bf16":
        # bit-identical outputs (the model casts fp32->bf16 in-graph anyway);
        # halves param HBM residency — the serving headroom (utils/params.py)
        from minddiffusion_tpu.utils.params import cast_serving_params

        params = jax.jit(cast_serving_params)(params)
    pipe = StableDiffusionPipeline(models)
    fn = pipe.build_txt2img(height=args.height, width=args.width,
                            num_steps=args.steps, sampler=args.sampler,
                            guidance_scale=args.scale,
                            batch_size=args.batch_size)
    tok = tokenizer_for(args.family)
    f = models.latent_factor
    adapter = SDAdapter(fn, params, lambda s: tok.tokenize(s)[0],
                        (args.height // f, args.width // f))
    desc = f"{args.sampler}-{args.steps} {args.height}x{args.width}"
    return BatchingEngine(adapter, batch_size=args.batch_size,
                          max_wait_ms=args.max_wait_ms), desc


def _build_glide_engine(args):
    # SD-only geometry/sampler flags have no effect on the fixed
    # 64->256->1024 cascade — warn instead of silently dropping them
    _SD_ONLY = {"height": 512, "width": 512, "steps": 50,
                "sampler": "ddim", "scale": 9.0}
    dropped = [f"--{k}" for k, default in _SD_ONLY.items()
               if getattr(args, k) != default]
    if dropped:
        print(f"[serve] WARNING: {', '.join(dropped)} ignored for "
              f"--family glide (use --denoise_steps/--super_res_steps/"
              f"--glide_scale; geometry is the fixed cascade)")

    import jax.numpy as jnp
    import numpy as np

    from minddiffusion_tpu.pipelines.glide_cascade import (
        GlideCascadePipeline, GlideModels)
    from minddiffusion_tpu.serving import BatchingEngine, GlideAdapter
    from minddiffusion_tpu.text.glide_text import padded_tokens_and_mask

    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    if args.debug_tiny:
        from minddiffusion_tpu.models.glide import GlideUNetConfig, XfConfig

        tiny = dict(in_channels=3, model_channels=32, num_res_blocks=1,
                    attention_resolutions=(2,), channel_mult=(1, 2),
                    num_head_channels=16)
        models = GlideModels.create(
            dtype=dtype, base_respacing="4", sr_respacing="3",
            base_unet=GlideUNetConfig(**tiny),
            sr_unet=GlideUNetConfig(**{**tiny, "in_channels": 6}),
            xf=XfConfig(width=32, layers=2, heads=4, text_ctx=8, n_vocab=64),
            with_srgan=not args.no_srgan)
        sizes = dict(base_size=16, sr_size=32)
    else:
        models = GlideModels.create(dtype=dtype,
                                    base_respacing=args.denoise_steps,
                                    sr_respacing=args.super_res_steps,
                                    with_srgan=not args.no_srgan)
        sizes = {}
    if args.ckpt:
        from minddiffusion_tpu.io.checkpoints import load_checkpoint

        params = load_checkpoint(args.ckpt)
    else:
        print("WARNING: no checkpoint — RANDOM weights (noise images)")
        params = models.init_params(jax.random.PRNGKey(0), **sizes)

    fn = GlideCascadePipeline(models).build_generate(
        batch_size=args.batch_size, guidance_scale=args.glide_scale,
        run_srgan=not args.no_srgan, **sizes)

    ctx = models.base.xf_config.text_ctx
    if args.tokenizer_model:
        from minddiffusion_tpu.text.glide_text import GlideSentencePieceTokenizer

        sp = GlideSentencePieceTokenizer(args.tokenizer_model)
        tok_pair = lambda s: padded_tokens_and_mask(  # noqa: E731
            sp.encode(s), ctx, sp.end_token)
    else:
        print("WARNING: no --tokenizer_model — placeholder token ids")
        tok_pair = lambda s: (np.ones((ctx,), np.int32),  # noqa: E731
                              np.ones((ctx,), np.int32))
    stage = "super_res" if args.no_srgan else "srgan"
    adapter = GlideAdapter(fn, params, tok_pair, stage=stage)
    desc = f"glide {args.denoise_steps}+{args.super_res_steps} -> {stage}"
    return BatchingEngine(adapter, batch_size=args.batch_size,
                          max_wait_ms=args.max_wait_ms), desc


def main(argv=None) -> None:
    args = build_argparser().parse_args(argv)

    from minddiffusion_tpu.serving import make_server

    if args.family == "glide":
        engine, desc = _build_glide_engine(args)
    else:
        engine, desc = _build_sd_engine(args)
    engine.start()

    # warm the compile before accepting traffic
    print(f"[serve] compiling {desc} b{args.batch_size} on "
          f"{jax.devices()[0].device_kind}...")
    engine.submit("warmup", seed=0)
    print("[serve] compiled; serving")

    srv = make_server(engine, args.host, args.port,
                      info={"family": args.family, "config": desc,
                            "batch_size": args.batch_size,
                            "dtype": args.dtype})
    print(f"[serve] listening on {args.host}:{args.port}")
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        srv.shutdown()
        engine.stop()


if __name__ == "__main__":
    main()
