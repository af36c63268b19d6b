"""Real-TPU training soak: SD2 LoRA finetune, a few hundred steps on one
chip (VERDICT r4 item 8 — the train story was step-benched and
CPU-mesh-tested, but no loss curve had been produced on hardware).

What it exercises, all through the shipping stack (train/loop.Trainer,
LossMonitor, ProfilerCallback, io/checkpoints.CheckpointManager, the
human/json/csv/tensorboard KV logger):
  * loss DECREASES: a fixed pool of synthetic latent-cached batches is
    cycled, so the LoRA adapters (zero-init B => step-0 loss is the frozen
    base model's) can overfit the pool;
  * ProfilerCallback captures a real trace window mid-run;
  * CheckpointManager + Trainer(ckpt_transform=trainable_only) save
    ADAPTER-ONLY periodic checkpoints (the cli/train.py LoRA wiring); the
    midpoint saves {step, adapters, opt_state} — everything a LoRA resume
    needs — restores it into a FRESH state (merge_params over base) and
    training continues: the resumed loss must match the un-interrupted
    trajectory's scale (optimizer moments travel with the checkpoint).
    Full-params saves are deliberately avoided ON THE SOAK only: the axon
    relay moves one big array at ~3 MB/s (measured — a 2.6 GB full-state
    save would cost ~40 min of chip time); on a real TPU VM d2h is GB/s and
    the full-TrainState path (CPU-mesh-tested in tests/) is practical.

Usage: python benchmarks/train_soak.py [steps=300] [batch=8]
Writes the KV streams + trace under /tmp/train_soak/.
"""
from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/minddiffusion_jax_cache")

from minddiffusion_tpu.io.checkpoints import (  # noqa: E402
    CheckpointManager, load_checkpoint, merge_params, save_checkpoint)
from minddiffusion_tpu.pipelines.stable_diffusion import SDModels  # noqa: E402
from minddiffusion_tpu.train.loop import (  # noqa: E402
    LossMonitor, ProfilerCallback, Trainer)
from minddiffusion_tpu.train.optim import lora_checkpoint_transform  # noqa: E402
from minddiffusion_tpu.train.trainer import (  # noqa: E402
    TrainConfig, create_train_state, make_train_step)
from minddiffusion_tpu.utils.logger import KVLogger  # noqa: E402


class PoolDataset:
    """Cycles a fixed pool of synthetic latent-cached batches (learnable:
    the pool is finite, so the adapters can fit its noise/latent pairs)."""

    def __init__(self, n_batches: int, batch: int, steps_per_epoch: int):
        rs = np.random.RandomState(0)
        self.pool = [{
            "latent": rs.randn(batch, 64, 64, 4).astype(np.float32),
            "tokens": rs.randint(1, 30000, size=(batch, 77)).astype(np.int32),
        } for _ in range(n_batches)]
        self.steps_per_epoch = steps_per_epoch

    def epoch(self, i: int):
        for s in range(self.steps_per_epoch):
            yield self.pool[(i * self.steps_per_epoch + s) % len(self.pool)]


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 300
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    root = "/tmp/train_soak"
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root)

    models = SDModels.create(family="sd2", dtype=jnp.bfloat16,
                             enable_lora=True, attn_impl="pallas")

    def make_params():
        """Deterministic base params, with every reference-zero_module kernel
        enlivened. Called twice: the train step donates its state, so the
        first fit() deletes the original buffers — the fresh resume state
        must re-init rather than reuse them.

        Random init zero-inits the zero_module layers (final out_conv, every
        ResBlock second conv, every SpatialTransformer proj_out). LoRA
        training freezes all of them — and the adapters live INSIDE the
        transformer behind proj_out, so with proj_out == 0 the loss gradient
        w.r.t. every adapter is identically zero (measured: bit-identical
        loss trajectories across a 10x LR change). A pretrained checkpoint
        (the real LoRA scenario) has none of these at zero; mimic that by
        randomizing every all-zero kernel EXCEPT lora_b (whose zero init is
        the adapter contract)."""
        import zlib

        import jax.tree_util as jtu

        p = jax.jit(lambda r: models.init_params(r, height=512, width=512))(
            jax.random.PRNGKey(0))
        # ONE jitted reduction + one small d2h for the zero test — per-leaf
        # float(sum) probes would cost a ~25 ms tunneled dispatch each
        zero = jax.device_get(jax.jit(
            lambda t: jax.tree.map(lambda l: jnp.abs(l).sum() == 0, t))(p))

        def liven(path, leaf, is_zero):
            name = "/".join(str(k) for k in path)
            if "lora_" in name or leaf.ndim < 2 or not is_zero:
                return leaf  # adapters keep their contract; biases stay 0
            # crc32, not hash(): stable across processes (PYTHONHASHSEED)
            seed = jax.random.fold_in(jax.random.PRNGKey(99),
                                      zlib.crc32(name.encode()) % (2**31))
            return 0.02 * jax.random.normal(seed, leaf.shape, leaf.dtype)

        p = jax.jit(lambda t: jtu.tree_map_with_path(liven, t, zero))(p)
        jax.block_until_ready(p)
        return p

    params = make_params()
    # Short-run schedule: the config-default warmup (1000 steps to 1e-5)
    # would leave a 300-step soak entirely inside warmup. LR is soak-sized:
    # Adam moves parameters ~lr per step regardless of grad scale, so a
    # 300-step window needs 2e-3 for rank-4 adapters to displace enough to
    # move the loss measurably (2e-4 measured dead flat over 300 steps).
    cfg = TrainConfig(trainable="lora", start_lr=2e-3, end_lr=1e-4,
                      warmup_steps=20, decay_steps=10_000)
    state = create_train_state(models, params, cfg)
    step_fn = jax.jit(make_train_step(models, cfg), donate_argnums=(0,))

    lora_only = lora_checkpoint_transform(params)

    logger = KVLogger(root, formats=("human", "json", "csv", "tensorboard"))
    dataset = PoolDataset(n_batches=16, batch=batch, steps_per_epoch=steps)
    trainer = Trainer(
        step_fn=step_fn, dataset=dataset, rng=jax.random.PRNGKey(7),
        callbacks=[LossMonitor(logger, log_every=10),
                   ProfilerCallback(os.path.join(root, "trace"), 50, 55)],
        ckpt_manager=CheckpointManager(os.path.join(root, "ckpt"),
                                       save_every_steps=100, keep_max=2),
        ckpt_transform=lora_only,
        max_steps=steps // 2,
    )

    t0 = time.time()
    state = trainer.fit(state, epochs=1)
    half_step = int(np.asarray(jax.device_get(state.step)))
    print(f"[soak] first half done: step={half_step} "
          f"wall={time.time()-t0:.1f}s", file=sys.stderr, flush=True)

    # midpoint LoRA-resume bundle: {step, adapters, opt_state} -> restore
    # into a FRESH state (adapters merged over base params) -> continue
    mid = {"step": state.step, "params": lora_only(state.params),
           "opt_state": state.opt_state}
    save_checkpoint(os.path.join(root, "state_mid"), mid)
    # free the first half's state BEFORE building the resume state — holding
    # both full param trees (plus step workspace) overflows the 16 GiB HBM
    del mid, state
    # step 0, fresh opt state, re-initialized base (the originals were donated)
    fresh = create_train_state(models, make_params(), cfg)
    target = {"step": fresh.step, "params": lora_only(fresh.params),
              "opt_state": fresh.opt_state}
    loaded = load_checkpoint(os.path.join(root, "state_mid"), target=target)
    restored = fresh.replace(
        step=loaded["step"],
        params=merge_params(fresh.params, loaded["params"]),
        opt_state=loaded["opt_state"])
    r_step = int(np.asarray(jax.device_get(restored.step)))
    assert r_step == half_step, (r_step, half_step)
    print(f"[soak] LoRA TrainState restored at step {r_step} "
          "(adapters + optimizer moments + step)", file=sys.stderr, flush=True)

    trainer2 = Trainer(
        step_fn=step_fn, dataset=dataset, rng=jax.random.PRNGKey(7),
        callbacks=[LossMonitor(logger, log_every=10)],
        ckpt_manager=CheckpointManager(os.path.join(root, "ckpt"),
                                       save_every_steps=100, keep_max=2),
        ckpt_transform=lora_only,
        max_steps=steps,
    )
    state = trainer2.fit(restored, epochs=2)
    final_step = int(np.asarray(jax.device_get(state.step)))
    print(f"[soak] resumed half done: step={final_step} "
          f"total wall={time.time()-t0:.1f}s", file=sys.stderr, flush=True)

    # ---- verdicts ----------------------------------------------------------
    import json
    rows = [json.loads(l) for l in open(os.path.join(root, "log.jsonl"))]
    losses = [(r["step"], r["loss"]) for r in rows if "loss" in r]
    w_first = [v for s, v in losses if s <= 30] or [v for _, v in losses[:1]]
    w_last = ([v for s, v in losses if s > final_step - 50]
              or [v for _, v in losses[-1:]])
    assert w_first and w_last, "no loss rows logged (run too short?)"
    first = np.mean(w_first)
    last = np.mean(w_last)
    print(f"[soak] loss first30={first:.4f} last50={last:.4f}",
          file=sys.stderr, flush=True)
    ckpts = sorted(os.listdir(os.path.join(root, "ckpt")))
    trace_ok = any("trace" in d for d in os.listdir(root)) and any(
        os.scandir(os.path.join(root, "trace")))
    tb_ok = any(f.startswith("events.out.tfevents")
                for f in os.listdir(os.path.join(root, "tb")))
    print(json.dumps({
        "steps": final_step, "batch": batch,
        "loss_first30": round(float(first), 4),
        "loss_last50": round(float(last), 4),
        "loss_decreased": bool(last < first),
        "resume_step_ok": True,
        "checkpoints": ckpts,
        "profiler_trace_written": bool(trace_ok),
        "tensorboard_events_written": bool(tb_ok),
    }))


if __name__ == "__main__":
    main()
