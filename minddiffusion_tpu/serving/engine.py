"""Micro-batching serving engine for one compiled txt2img program.

The reference has no serving story beyond its CLI (one process, one fixed
batch per invocation — stablediffusionv2/txt2img.py:244-281); production TPU
serving wants the opposite: a long-lived process holding ONE compiled XLA
program at a fixed batch size, with dynamic request traffic micro-batched
onto it. This engine provides that:

  * requests arrive on any thread via `submit()` (blocking) and are grouped
    by a background worker into batches of the compiled size — a partial
    batch is padded by repeating rows (static shapes, no recompiles);
  * per-request determinism: each request's initial latent x_T is derived
    from its OWN seed (host-side Philox counter RNG) and passed through the
    pipeline's explicit-`noise` input, so the same (prompt, seed) returns
    the same image no matter which requests it happened to be batched with —
    DDIM/PLMS/DPM consume no randomness beyond x_T;
  * tokenization stays host-side on the caller thread (same contract as the
    reference's data path, SURVEY §1 L1->L2).

Throughput equals the driver-bench number (it is the same compiled program);
the engine only adds queueing. See cli/serve.py for the HTTP front end.
"""
from __future__ import annotations

import queue
import threading
import time
from dataclasses import dataclass, field
from typing import Callable, Optional

import jax
import numpy as np


@dataclass
class _Pending:
    tokens: np.ndarray          # (L,) int32
    uncond_tokens: np.ndarray   # (L,) int32
    seed: int
    done: threading.Event = field(default_factory=threading.Event)
    image: Optional[np.ndarray] = None   # (H, W, 3) uint8
    error: Optional[BaseException] = None


class BatchingEngine:
    """Wraps a compiled `fn(params, tokens, uncond, key, noise) -> uint8
    images` (from StableDiffusionPipeline.build_txt2img) with a request queue.

    batch_size must match the batch the program was built for. `max_wait_ms`
    bounds how long the worker holds the first request of a batch while
    waiting for more traffic.
    """

    def __init__(self, fn: Callable, params, tokenize: Callable[[str], np.ndarray],
                 *, batch_size: int, latent_hw: tuple, max_wait_ms: float = 25.0):
        self._fn = fn
        self._params = params
        self._tokenize = tokenize
        self._batch = batch_size
        self._latent_hw = latent_hw
        self._max_wait = max_wait_ms / 1000.0
        self._q: "queue.Queue[_Pending]" = queue.Queue()
        self._stop = threading.Event()
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._started = False
        # stats
        self.batches_run = 0
        self.requests_served = 0

    # -- lifecycle ---------------------------------------------------------

    def start(self) -> "BatchingEngine":
        if not self._started:
            self._worker.start()
            self._started = True
        return self

    def stop(self, join_timeout: float = 10.0) -> None:
        self._stop.set()
        if self._started:
            self._worker.join(timeout=join_timeout)

    # -- client API --------------------------------------------------------

    def submit(self, prompt: str, negative_prompt: str = "", seed: int = 0,
               timeout: Optional[float] = None) -> np.ndarray:
        """Blocks until the image is ready; thread-safe. Same (prompt,
        negative_prompt, seed) -> bitwise-same image, independent of batching."""
        req = _Pending(
            tokens=np.asarray(self._tokenize(prompt), np.int32),
            uncond_tokens=np.asarray(self._tokenize(negative_prompt), np.int32),
            seed=int(seed),
        )
        self._q.put(req)
        if not req.done.wait(timeout):
            raise TimeoutError("generation timed out")
        if req.error is not None:
            raise req.error
        return req.image

    # -- worker ------------------------------------------------------------

    def _collect(self) -> list:
        try:
            first = self._q.get(timeout=0.1)
        except queue.Empty:
            return []
        batch = [first]
        deadline = time.monotonic() + self._max_wait
        while len(batch) < self._batch:
            remaining = deadline - time.monotonic()
            if remaining <= 0:
                break
            try:
                batch.append(self._q.get(timeout=remaining))
            except queue.Empty:
                break
        return batch

    def _run(self) -> None:
        h8, w8 = self._latent_hw
        fixed_key = jax.random.PRNGKey(0)  # all randomness comes from `noise`
        while not self._stop.is_set():
            batch = self._collect()
            if not batch:
                continue
            n = len(batch)
            pad = self._batch - n
            rows = batch + [batch[-1]] * pad  # repeat-pad to the static batch
            try:
                tokens = np.stack([r.tokens for r in rows])
                uncond = np.stack([r.uncond_tokens for r in rows])
                # host-side counter-based RNG: deterministic per seed and
                # costs no device dispatch (a per-request jax.random.normal
                # would round-trip the TPU ~25 ms each over the tunnel)
                noise = np.stack([
                    np.random.Generator(np.random.Philox(r.seed))
                    .standard_normal((h8, w8, 4), np.float32)
                    for r in rows])
                imgs = np.asarray(self._fn(self._params, tokens, uncond,
                                           fixed_key, noise))
                for i, r in enumerate(batch):
                    r.image = imgs[i]
                    r.done.set()
                self.batches_run += 1
                self.requests_served += n
            except BaseException as e:  # noqa: BLE001 — fail the waiting callers
                for r in batch:
                    r.error = e
                    r.done.set()
