"""Micro-batching serving engine over one compiled generation program.

The reference has no serving story beyond its CLI (one process, one fixed
batch per invocation — stablediffusionv2/txt2img.py:244-281); production TPU
serving wants the opposite: a long-lived process holding ONE compiled XLA
program at a fixed batch size, with dynamic request traffic micro-batched
onto it. This engine provides that:

  * requests arrive on any thread via `submit()` (blocking) and are grouped
    by a background worker into batches of the compiled size — a partial
    batch is padded by repeating rows (static shapes, no recompiles);
  * per-request determinism: every stochastic input of a request derives
    from its OWN seed, so the same (prompt, negative_prompt, seed) returns
    the same image no matter which requests it happened to be batched with.
    For SD that is the initial latent x_T (host Philox -> the pipeline's
    explicit-`noise` input; DDIM/PLMS/DPM consume no other randomness); for
    GLIDE it is the cascade's `row_seeds` input (per-row uncond tokens, x_T,
    ancestral noise — pipelines/glide_cascade.build_generate);
  * tokenization stays host-side on the caller thread (same contract as the
    reference's data path, SURVEY §1 L1->L2).

The engine core is family-agnostic: it batches requests and calls a
`run_batch(requests) -> (B, H, W, 3) uint8` adapter. `sd_run_batch` /
`glide_run_batch` build the adapters for the two pipeline families.
Throughput equals the bench number for the same program; the engine only
adds queueing. See cli/serve.py for the HTTP front end.
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
class Request:
    prompt: str
    negative_prompt: str
    seed: int
    done: threading.Event = field(default_factory=threading.Event)
    image: Optional[np.ndarray] = None   # (H, W, 3) uint8
    error: Optional[BaseException] = None


def sd_run_batch(fn: Callable, params, tokenize: Callable[[str], np.ndarray],
                 latent_hw: tuple) -> Callable:
    """Adapter for StableDiffusionPipeline.build_txt2img programs
    (`fn(params, tokens, uncond, key, noise) -> uint8 images`)."""
    h8, w8 = latent_hw
    fixed_key = jax.random.PRNGKey(0)  # all randomness comes from `noise`

    def run(rows: list) -> np.ndarray:
        tokens = np.stack([np.asarray(tokenize(r.prompt), np.int32) for r in rows])
        uncond = np.stack([np.asarray(tokenize(r.negative_prompt), np.int32)
                           for r in rows])
        # host-side counter-based RNG: deterministic per seed and costs no
        # device dispatch (a per-request jax.random.normal would round-trip
        # the TPU ~25 ms each over the tunnel)
        noise = np.stack([
            np.random.Generator(np.random.Philox(r.seed))
            .standard_normal((h8, w8, 4), np.float32)
            for r in rows])
        return np.asarray(fn(params, tokens, uncond, fixed_key, noise))

    return run


def glide_run_batch(fn: Callable, params,
                    tokenize: Callable[[str], tuple], stage: str = "srgan") -> Callable:
    """Adapter for GlideCascadePipeline.build_generate programs
    (`fn(params, tokens, mask, key, row_seeds) -> {stage: uint8 images}`).

    `tokenize(prompt) -> (tokens, mask)` (padded_tokens_and_mask). GLIDE has
    no negative-prompt input (its uncond is random tokens); a request's
    negative_prompt is ignored. `stage` picks which cascade output to serve.
    """
    fixed_key = jax.random.PRNGKey(0)  # all randomness comes from row_seeds

    def run(rows: list) -> np.ndarray:
        toks, masks = zip(*(tokenize(r.prompt) for r in rows))
        tokens = np.stack([np.asarray(t, np.int32) for t in toks])
        mask = np.stack([np.asarray(m, np.int32) for m in masks])
        seeds = np.asarray([r.seed for r in rows], np.int32)
        out = fn(params, tokens, mask, fixed_key, seeds)
        return np.asarray(out[stage])

    return run


class BatchingEngine:
    """Batches concurrent requests onto one compiled program.

    `run_batch(list[Request]) -> (batch_size, H, W, 3) uint8` — build it with
    sd_run_batch / glide_run_batch. batch_size must match the batch the
    program was compiled for. `max_wait_ms` bounds how long the worker holds
    the first request of a batch while waiting for more traffic.
    """

    def __init__(self, run_batch: Callable, *, batch_size: int,
                 max_wait_ms: float = 25.0):
        self._run_batch = run_batch
        self._batch = batch_size
        self._max_wait = max_wait_ms / 1000.0
        self._q: "queue.Queue[Request]" = queue.Queue()
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
        req = Request(prompt=prompt, negative_prompt=negative_prompt,
                      seed=int(seed))
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
        while not self._stop.is_set():
            batch = self._collect()
            if not batch:
                continue
            n = len(batch)
            rows = batch + [batch[-1]] * (self._batch - n)  # repeat-pad
            try:
                imgs = self._run_batch(rows)
                for i, r in enumerate(batch):
                    r.image = imgs[i]
                    r.done.set()
                self.batches_run += 1
                self.requests_served += n
            except BaseException as e:  # noqa: BLE001 — fail the waiting callers
                for r in batch:
                    r.error = e
                    r.done.set()
