"""Training loop: epochs x steps with callbacks, checkpoints, and profiling.

Replaces MindSpore's `Model.train(epochs, dataset, callbacks)` + the
reference's callback zoo (run_train.py:187-208; glide_utils/
callbackConfig.py): TimeMonitor/LossMonitor -> per-step metrics through the
KV logger; OverflowMonitor -> the grads_finite metric (bf16 needs no loss
scaling); StopAtStep profiler windows -> ProfilerCallback driving
`jax.profiler.start_trace` (Perfetto/XPlane, the TPU-native tracing story,
SURVEY.md §5.1); ModelCheckpoint/CheckpointConfig -> orbax CheckpointManager
with full TrainState resume (which the reference cannot do, §5.4).
"""
from __future__ import annotations

import dataclasses
import time
from typing import Callable, Iterable, List, Optional

import jax
import numpy as np

from minddiffusion_tpu.io.checkpoints import CheckpointManager
from minddiffusion_tpu.utils.logger import KVLogger, get_logger


class Callback:
    def on_step_end(self, step: int, metrics: dict) -> None: ...
    def on_epoch_end(self, epoch: int) -> None: ...


class LossMonitor(Callback):
    def __init__(self, logger: Optional[KVLogger] = None, log_every: int = 10):
        self.logger = logger or get_logger()
        self.log_every = log_every
        self._t0 = time.time()

    def on_step_end(self, step: int, metrics: dict) -> None:
        self.logger.logkv_mean("loss", float(metrics["loss"]))
        self.logger.logkv_mean("step_time_s", time.time() - self._t0)
        self._t0 = time.time()
        if "grads_finite" in metrics and float(metrics["grads_finite"]) != 1.0:
            # OverflowMonitor parity (callback.py:19-27)
            self.logger.logkv("nonfinite_grad_step", step)
        if step % self.log_every == 0:
            self.logger.logkv("step", step)
            self.logger.dumpkvs()


class ProfilerCallback(Callback):
    """Capture a jax.profiler trace over [start_step, stop_step)."""

    def __init__(self, log_dir: str, start_step: int, stop_step: int):
        self.log_dir = log_dir
        self.start_step = start_step
        self.stop_step = stop_step
        self._active = False

    def on_step_end(self, step: int, metrics: dict) -> None:
        if step + 1 == self.start_step and not self._active:
            jax.profiler.start_trace(self.log_dir)
            self._active = True
        elif step + 1 == self.stop_step and self._active:
            jax.profiler.stop_trace()
            self._active = False


@dataclasses.dataclass
class Trainer:
    """step_fn(state, batch, rng) -> (state, metrics); dataset yields numpy
    batch dicts per epoch; shard_batch places them on the mesh."""

    step_fn: Callable
    dataset: object              # exposes .epoch(i) iterators
    rng: jax.Array
    shard_batch: Callable = lambda b: b
    callbacks: List[Callback] = dataclasses.field(default_factory=list)
    ckpt_manager: Optional[CheckpointManager] = None
    max_steps: Optional[int] = None
    # Maps state.params -> the tree the ckpt_manager saves. LoRA training
    # passes trainable_only(.) so periodic checkpoints hold just the adapters
    # (MindPet's choice_func filtering in the reference's save flow) instead
    # of the full frozen base — ~MBs vs GBs per save.
    ckpt_transform: Optional[Callable] = None

    def fit(self, state, epochs: int = 1):
        try:
            step = int(np.asarray(jax.device_get(state.step)))
            for epoch in range(epochs):
                for batch in self.dataset.epoch(epoch):
                    batch = self.shard_batch(batch)
                    state, metrics = self.step_fn(state, batch, self.rng)
                    step += 1
                    metrics = jax.device_get(metrics)
                    for cb in self.callbacks:
                        cb.on_step_end(step, metrics)
                    if (self.ckpt_manager is not None
                            and self.ckpt_manager.should_save(step)):
                        tree = (self.ckpt_transform(state.params)
                                if self.ckpt_transform else state.params)
                        self.ckpt_manager.maybe_save(step, tree)
                    if self.max_steps is not None and step >= self.max_steps:
                        return state
                for cb in self.callbacks:
                    cb.on_epoch_end(epoch)
            return state
        finally:
            if self.ckpt_manager is not None:
                # async orbax saves must drain before interpreter shutdown
                self.ckpt_manager.wait_until_finished()
                self.ckpt_manager.close()
