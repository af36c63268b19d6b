"""Benchmark: SD2 512x512 txt2img, 50-step DDIM, img/s/chip on one TPU.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline target (BASELINE.json): 2.0 img/s/chip on TPU v5e. The reference
itself publishes no throughput numbers — only the "8 simultaneous 512x512
images per Ascend 910" capacity claim (stablediffusionv2/README.md:58), which
batch=8 here mirrors.

The whole pipeline (CLIP-H encode of the CFG-folded token batch -> 50-step
DDIM lax.scan over the UNet -> VAE decode -> uint8) is ONE jitted XLA program;
the reference's host loop launches ~101 separate UNet graphs per batch
(plms.py:151-177). Weights are random-init (throughput is weight-agnostic).
"""
from __future__ import annotations

import json
import sys
import time


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main() -> None:
    t_start = time.time()
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/minddiffusion_jax_cache")
    except Exception:
        pass
    import jax.numpy as jnp

    from minddiffusion_tpu.pipelines.stable_diffusion import SDModels, StableDiffusionPipeline

    try:
        dev = jax.devices()[0]
    except RuntimeError as e:
        # Transient TPU-pool outage (axon backend raises UNAVAILABLE). A
        # failed PJRT init is cached for the process lifetime, so retry by
        # re-exec'ing in a fresh process until the wait budget runs out.
        # Permanent init failures (unknown backend, bad plugin) fail fast —
        # retrying those would just delay the driver's failure signal.
        import os
        import sys

        transient = any(t in str(e) for t in
                        ("UNAVAILABLE", "DEADLINE_EXCEEDED", "unavailable"))
        if not transient:
            raise

        start = float(os.environ.setdefault("MDT_BENCH_WAIT_START",
                                            str(t_start)))
        waited = time.time() - start  # wall clock incl. the hang itself
        budget = float(os.environ.get("MDT_BENCH_WAIT_BUDGET_S", "2700"))
        if waited >= budget:
            log(f"TPU unavailable after {waited:.0f}s of retries: {e}")
            raise
        log(f"TPU unavailable ({e}); retrying in 60s "
            f"({waited:.0f}/{budget:.0f}s elapsed)")
        time.sleep(60)
        os.execv(sys.executable, [sys.executable] + sys.argv)
    log(f"device: {dev.device_kind} ({jax.default_backend()})")

    BATCH = 8
    STEPS = 50
    H = W = 512

    # Serving config: "pallas_fast" = static-shift softmax in the attention
    # kernel. Mathematically identical to exact softmax for any logit < 108
    # (softmax is shift-invariant; the only divergence is fp32 exp overflow,
    # and SD logits sit |s| < ~30); measured -2.6 ms on the 91.6 ms UNet step.
    # Training and the library default keep the exact online softmax.
    models = SDModels.create(family="sd2", dtype=jnp.bfloat16,
                             attn_impl="pallas_fast")
    log("initializing params (random weights, jitted as one program)...")
    params = jax.jit(
        lambda r: models.init_params(r, height=H, width=W)
    )(jax.random.PRNGKey(0))
    jax.block_until_ready(params)
    # store matmul/conv kernels in the compute dtype: bit-identical outputs
    # (the model casts fp32->bf16 in-graph anyway; tests/test_models.py),
    # measured e2e-NEUTRAL for throughput (1.904 vs 1.906 img/s — the scan's
    # weight re-reads overlap with compute), but it halves param HBM
    # residency (5.2 GB -> 2.6 GB), which is the serving headroom that lets
    # 768²/b8 and larger configs fit comfortably (utils/params.py)
    from minddiffusion_tpu.utils.params import cast_serving_params

    params = jax.jit(cast_serving_params)(params)
    jax.block_until_ready(params)
    n_params = sum(x.size for x in jax.tree.leaves(params))
    log(f"params: {n_params/1e6:.0f}M")

    pipe = StableDiffusionPipeline(models)
    tokens = jnp.ones((BATCH, 77), jnp.int32)
    uncond = jnp.zeros((BATCH, 77), jnp.int32)

    def measure(sampler: str, steps: int,
                steady_state: bool = False) -> "tuple[float, float]":
        """Returns (blocking img/s from the 3-run min, steady-state img/s).

        The steady-state pass (4 batches enqueued back-to-back, blocked
        once) only runs when requested — it costs ~4 extra batch
        computations — and is a SINGLE timing pass, so it carries more
        session variance than the 3-run-min headline. Skipped runs return
        0.0 for the second element."""
        fn = pipe.build_txt2img(height=H, width=W, num_steps=steps,
                                sampler=sampler, guidance_scale=9.0,
                                batch_size=BATCH)
        log(f"[{sampler}-{steps}] compiling + first run...")
        t0 = time.time()
        img = fn(params, tokens, uncond, jax.random.PRNGKey(1))
        img.block_until_ready()
        log(f"[{sampler}-{steps}] first run (incl. compile): "
            f"{time.time()-t0:.1f}s; out {img.shape} {img.dtype}")
        times = []
        for i in range(3):
            t0 = time.time()
            img = fn(params, tokens, uncond, jax.random.PRNGKey(2 + i))
            img.block_until_ready()
            times.append(time.time() - t0)
            log(f"[{sampler}-{steps}] run {i}: {times[-1]:.3f}s "
                f"({BATCH/times[-1]:.3f} img/s)")
        log(f"[{sampler}-{steps}] p50 per-image latency: "
            f"{sorted(times)[len(times)//2]/BATCH*1000:.1f} ms")

        # steady-state serving throughput: enqueue 4 batches back-to-back
        # (JAX dispatch is async) and block once — hides the per-launch host
        # dispatch gap (~25 ms over the axon relay) that the blocking
        # protocol above pays per batch. Reported as a side field; the
        # headline stays the blocking protocol for round-over-round
        # comparability (measured r4i: 1.9530 pipelined vs 1.9426 blocking).
        ss = 0.0
        if steady_state:
            t0 = time.time()
            outs = [fn(params, tokens, uncond, jax.random.PRNGKey(10 + i))
                    for i in range(4)]
            jax.block_until_ready(outs)
            ss = BATCH * 4 / (time.time() - t0)
            log(f"[{sampler}-{steps}] steady-state (4 batches in flight): "
                f"{ss:.3f} img/s")
        return BATCH / min(times), ss

    ddim, ddim_ss = measure("ddim", STEPS, steady_state=True)
    # the reference SD2 default sampler is PLMS-50 (txt2img.py:143) — record
    # it alongside the DDIM headline (BASELINE.json's metric is DDIM-50)
    plms, _ = measure("plms", STEPS)
    log(f"total bench wall: {time.time()-t_start:.1f}s")

    # Model FLOP utilization of the blocking headline. Per-batch FLOPs:
    # 50 UNet evals at 12.55 TFLOP each (CFG batch 16 — compiled-flops count
    # incl. the Pallas attention/winograd custom calls XLA's own cost
    # analysis misses, benchmarks/bench_unet_step.py) + VAE decode ~21.4
    # TFLOP (113 ms at ~190 TF/s, r2 xprof) + CLIP-H encode ~1 TFLOP
    # ≈ 650 TFLOP. Peak: 197 TF/s bf16 on one v5e chip. Wall-clock based, so
    # it UNDERSTATES device MFU by the ~22 ms/batch host dispatch gap
    # (device-time MFU ≈ +0.6 pp): the r4 wall analysis (ROADMAP) puts the
    # program at ~80% MFU with attention at its d=64 MXU structural cap and
    # the conv classes at their 320-channel lane-padding caps.
    flop_per_batch = 650e12
    mfu = (flop_per_batch / (BATCH / ddim)) / 197e12

    print(json.dumps({
        "metric": "sd2_txt2img_512_ddim50_img_per_s_per_chip",
        "value": round(ddim, 4),
        "unit": "img/s/chip",
        "vs_baseline": round(ddim / 2.0, 4),
        "plms50_img_per_s_per_chip": round(plms, 4),
        "steady_state_img_per_s_per_chip": round(ddim_ss, 4),
        "mfu": round(mfu, 4),
    }))


if __name__ == "__main__":
    main()
