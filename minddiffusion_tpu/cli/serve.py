"""Serve txt2img over HTTP with TPU micro-batching.

Example:
    python -m minddiffusion_tpu.cli.serve --family sd2 --ckpt sd2.safetensors \
        --height 512 --width 512 --steps 50 --batch_size 8 --port 8000

POST /v1/txt2img {"prompt": "...", "seed": 42} -> PNG (base64). The engine
pads partial batches onto the one compiled program, so tail latency at low
traffic equals one batch time; throughput at saturation equals the driver
bench (it is the same program). No reference analogue — the reference's only
entry point is the one-shot CLI (stablediffusionv2/txt2img.py:66-287).
"""
from __future__ import annotations

import argparse

import jax


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--family", default="sd2",
                   choices=["sd2", "wukong"])
    p.add_argument("--ckpt", default=None, help="orbax dir / .safetensors / "
                   ".ckpt (torch or MindSpore); random init if omitted")
    p.add_argument("--height", type=int, default=512)
    p.add_argument("--width", type=int, default=512)
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--sampler", default="ddim",
                   choices=["ddim", "plms", "dpm"])
    p.add_argument("--scale", type=float, default=9.0)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--max_wait_ms", type=float, default=25.0)
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--dtype", default="bf16", choices=["bf16", "fp32"])
    p.add_argument("--debug_tiny", action="store_true")
    return p


def main(argv=None) -> None:
    args = build_argparser().parse_args(argv)

    from minddiffusion_tpu.cli.common import build_sd, load_params, tokenizer_for
    from minddiffusion_tpu.pipelines.stable_diffusion import StableDiffusionPipeline
    from minddiffusion_tpu.serving import BatchingEngine, make_server, sd_run_batch

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
    run_batch = sd_run_batch(fn, params, lambda s: tok.tokenize(s)[0],
                             (args.height // f, args.width // f))
    engine = BatchingEngine(run_batch, batch_size=args.batch_size,
                            max_wait_ms=args.max_wait_ms).start()

    # warm the compile before accepting traffic
    print(f"[serve] compiling {args.sampler}-{args.steps} "
          f"{args.height}x{args.width} b{args.batch_size} on "
          f"{jax.devices()[0].device_kind}...")
    engine.submit("warmup", seed=0)
    print("[serve] compiled; serving")

    srv = make_server(engine, args.host, args.port)
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
