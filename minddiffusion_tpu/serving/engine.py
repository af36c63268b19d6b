"""Micro-batching serving engine over one compiled generation program.

The reference has no serving story beyond its CLI (one process, one fixed
batch per invocation — stablediffusionv2/txt2img.py:244-281); production TPU
serving wants the opposite: a long-lived process holding ONE compiled XLA
program at a fixed batch size, with dynamic request traffic micro-batched
onto it. This engine provides that:

  * requests arrive on any thread via `submit()` (blocking) and are grouped
    by a background worker into batches of the compiled size — a partial
    batch is padded by repeating rows (static shapes, no recompiles);
  * per-request work (validation, tokenization, host-side noise) happens in
    `adapter.prepare()` ON THE CALLER THREAD: a bad request (invalid seed,
    tokenizer error) fails only its own caller, never a co-batched one, and
    tokenization overlaps with the previous batch's device time;
  * per-request determinism: every stochastic input of a request derives
    from its OWN seed, so the same (prompt, negative_prompt, seed) returns
    the same image no matter which requests it happened to be batched with.
    For SD that is the initial latent x_T (host Philox -> the pipeline's
    explicit-`noise` input; DDIM/PLMS/DPM consume no other randomness); for
    GLIDE it is the cascade's `row_seeds` input (per-row uncond tokens, x_T,
    ancestral noise — pipelines/glide_cascade.build_generate);
  * a caller that times out marks its request abandoned; the worker drops
    abandoned requests instead of burning batch slots on images nobody will
    read (overload sheds dead work instead of congestion-collapsing).

Adapters (SDAdapter / GlideAdapter) carry the per-family logic:
`prepare(prompt, negative_prompt, seed) -> payload` plus either
`run(payloads) -> (batch_size, H, W, 3) uint8` (simple, blocking) or the
split `dispatch(payloads) -> handle` / `fetch(handle) -> uint8` pair. With
the split form the worker keeps ONE batch in flight: it dispatches batch
N+1 (JAX dispatch is async) BEFORE fetching batch N, so the device never
idles through the host-side stack/dispatch/transfer gap between batches —
measured ~22 ms/batch on the 512² SD2 program over the axon relay
(ROADMAP r4i: 1.9530 img/s steady-state vs 1.9426 blocking). Throughput at
saturation therefore slightly EXCEEDS the blocking bench protocol; the
engine still adds no math. See cli/serve.py for the HTTP front end.
"""
from __future__ import annotations

import queue
import threading
import time
from dataclasses import dataclass, field
from typing import Callable, Optional

import jax
import numpy as np

_MAX_SEED = 2**63 - 1  # Philox accepts any non-negative Python int; cap sanely


class BatchExecutionError(RuntimeError):
    """A worker-side batch failure — a SERVER fault, never the caller's input.

    submit() wraps worker exceptions in this type so HTTP front ends can
    map client-input errors (adapter.prepare raising on the caller thread,
    e.g. ValueError for a bad seed) to 400 and batch failures to 500 without
    guessing from the exception class the worker happened to raise."""


@dataclass
class Request:
    payload: dict
    done: threading.Event = field(default_factory=threading.Event)
    image: Optional[np.ndarray] = None   # (H, W, 3) uint8
    error: Optional[BaseException] = None
    abandoned: bool = False


class SDAdapter:
    """StableDiffusionPipeline.build_txt2img programs
    (`fn(params, tokens, uncond, key, noise) -> uint8 images`)."""

    def __init__(self, fn: Callable, params,
                 tokenize: Callable[[str], np.ndarray], latent_hw: tuple):
        self._fn = fn
        self._params = params
        self._tokenize = tokenize
        self._latent_hw = latent_hw
        self._fixed_key = jax.random.PRNGKey(0)  # all randomness is in `noise`

    def prepare(self, prompt: str, negative_prompt: str, seed: int) -> dict:
        seed = int(seed)
        if not 0 <= seed <= _MAX_SEED:
            raise ValueError(f"seed must be in [0, 2**63), got {seed}")
        h8, w8 = self._latent_hw
        # host-side counter-based RNG: deterministic per seed and costs no
        # device dispatch (a per-request jax.random.normal would round-trip
        # the TPU ~25 ms each over the tunnel)
        noise = (np.random.Generator(np.random.Philox(seed))
                 .standard_normal((h8, w8, 4), np.float32))
        return {
            "tokens": np.asarray(self._tokenize(str(prompt)), np.int32),
            "uncond": np.asarray(self._tokenize(str(negative_prompt)), np.int32),
            "noise": noise,
        }

    def dispatch(self, payloads: list):
        """Enqueue the batch on the device (async); returns the device array."""
        tokens = np.stack([p["tokens"] for p in payloads])
        uncond = np.stack([p["uncond"] for p in payloads])
        noise = np.stack([p["noise"] for p in payloads])
        return self._fn(self._params, tokens, uncond, self._fixed_key, noise)

    def fetch(self, handle) -> np.ndarray:
        """Block on the device result and transfer it to host."""
        return np.asarray(handle)

    def run(self, payloads: list) -> np.ndarray:
        return self.fetch(self.dispatch(payloads))


class GlideAdapter:
    """GlideCascadePipeline.build_generate programs
    (`fn(params, tokens, mask, key, row_seeds) -> {stage: uint8 images}`).

    `tokenize(prompt) -> (tokens, mask)` (padded_tokens_and_mask). GLIDE has
    no negative-prompt input (its uncond is random tokens); a request's
    negative_prompt is ignored — IGNORED_PARAMS lets front ends surface the
    drop to the client. `stage` picks which cascade output to serve.
    """

    IGNORED_PARAMS = ("negative_prompt",)

    def __init__(self, fn: Callable, params, tokenize: Callable[[str], tuple],
                 stage: str = "srgan"):
        self._fn = fn
        self._params = params
        self._tokenize = tokenize
        self._stage = stage
        self._fixed_key = jax.random.PRNGKey(0)  # randomness is in row_seeds

    def prepare(self, prompt: str, negative_prompt: str, seed: int) -> dict:
        seed = int(seed)
        if not 0 <= seed < 2**31:  # row_seeds is an int32 pipeline input
            raise ValueError(f"seed must be in [0, 2**31), got {seed}")
        tokens, mask = self._tokenize(str(prompt))
        return {
            "tokens": np.asarray(tokens, np.int32),
            "mask": np.asarray(mask, np.int32),
            "seed": np.int32(seed),
        }

    def dispatch(self, payloads: list):
        tokens = np.stack([p["tokens"] for p in payloads])
        mask = np.stack([p["mask"] for p in payloads])
        seeds = np.asarray([p["seed"] for p in payloads], np.int32)
        return self._fn(self._params, tokens, mask, self._fixed_key, seeds)

    def fetch(self, handle) -> np.ndarray:
        return np.asarray(handle[self._stage])

    def run(self, payloads: list) -> np.ndarray:
        return self.fetch(self.dispatch(payloads))


class BatchingEngine:
    """Batches concurrent requests onto one compiled program via an adapter
    (SDAdapter / GlideAdapter). batch_size must match the batch the program
    was compiled for. `max_wait_ms` bounds how long the worker holds the
    first request of a batch while waiting for more traffic."""

    def __init__(self, adapter, *, batch_size: int, max_wait_ms: float = 25.0):
        self._adapter = adapter
        self._batch = batch_size
        self._max_wait = max_wait_ms / 1000.0
        self._q: "queue.Queue[Request]" = queue.Queue()
        self._stop = threading.Event()
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._started = False
        # stats
        self.batches_run = 0
        self.requests_served = 0
        self._abandoned_pending = 0   # timed-out requests still in the Queue
        self._abandoned_lock = threading.Lock()

    @property
    def adapter(self):
        return self._adapter

    @property
    def queue_depth(self) -> int:
        """Live backlog: queued requests someone is still waiting on.
        Abandoned (client-timed-out) entries sit in the Queue until the
        worker drains them but represent zero future work — excluded so
        monitoring doesn't see phantom load after a timeout storm."""
        return max(0, self._q.qsize() - self._abandoned_pending)

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
        negative_prompt, seed) -> bitwise-same image, independent of batching.
        Validation/tokenizer errors raise here without touching other
        requests."""
        req = Request(payload=self._adapter.prepare(prompt, negative_prompt,
                                                    seed))
        self._q.put(req)
        if not req.done.wait(timeout):
            # mark abandoned under the lock so the worker either drops it
            # from the queue or observes the flag at finish time — the
            # pending counter is decremented in exactly one of those places
            with self._abandoned_lock:
                if not req.done.is_set():
                    req.abandoned = True
                    self._abandoned_pending += 1
            raise TimeoutError("generation timed out")
        if req.error is not None:
            raise BatchExecutionError(
                f"batch execution failed: {req.error!r}") from req.error
        return req.image

    # -- worker ------------------------------------------------------------

    def _collect(self, idle_timeout: float = 0.1) -> list:
        batch = []
        deadline = None
        while len(batch) < self._batch:
            if deadline is None:
                try:
                    req = self._q.get(timeout=idle_timeout)
                except queue.Empty:
                    return batch
            else:
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    return batch
                try:
                    req = self._q.get(timeout=remaining)
                except queue.Empty:
                    return batch
            if req.abandoned:
                with self._abandoned_lock:
                    self._abandoned_pending = max(
                        0, self._abandoned_pending - 1)
                    req.abandoned = False  # counted exactly once
                continue  # caller timed out while queued — shed the dead work
            batch.append(req)
            if deadline is None:
                deadline = time.monotonic() + self._max_wait
        return batch

    def _fail(self, batch: list, e: BaseException) -> None:
        for r in batch:
            r.error = e
            self._finish(r)

    def _deliver(self, batch: list, imgs: np.ndarray) -> None:
        for i, r in enumerate(batch):
            r.image = imgs[i]
            self._finish(r)
        self.batches_run += 1
        self.requests_served += len(batch)

    def _run(self) -> None:
        # Split-adapter (dispatch/fetch) path keeps ONE batch in flight:
        # dispatch batch N+1 before fetching batch N, so the device works
        # through the host-side stack/dispatch/transfer gap (~22 ms/batch
        # measured, ROADMAP r4i). Plain run() adapters take the blocking
        # path unchanged.
        pipelined = (hasattr(self._adapter, "dispatch")
                     and hasattr(self._adapter, "fetch"))
        pending: Optional[tuple] = None  # (batch, in-flight device handle)
        while not self._stop.is_set():
            # with a batch in flight, don't sit out the full 0.1 s idle poll
            # before fetching a possibly-completed result (up to ~100 ms of
            # needless delivery latency for fast programs when traffic stops)
            batch = self._collect(idle_timeout=0.005 if pending else 0.1)
            handle = None
            if batch:
                rows = [r.payload for r in batch]
                rows += [rows[-1]] * (self._batch - len(batch))  # repeat-pad
                if pipelined:
                    try:
                        handle = self._adapter.dispatch(rows)
                    except BaseException as e:  # noqa: BLE001 — fail callers
                        self._fail(batch, e)
                        batch = []
                else:
                    try:
                        self._deliver(batch, self._adapter.run(rows))
                    except BaseException as e:  # noqa: BLE001 — fail callers
                        self._fail(batch, e)
                    batch = []
            if pending is not None:
                pbatch, phandle = pending
                pending = None
                try:
                    self._deliver(pbatch, self._adapter.fetch(phandle))
                except BaseException as e:  # noqa: BLE001 — device faults
                    # surface at the blocking fetch; they belong to THIS
                    # batch, never the one dispatched above
                    self._fail(pbatch, e)
            if batch:
                pending = (batch, handle)
        if pending is not None:  # drain the in-flight batch on stop()
            pbatch, phandle = pending
            try:
                self._deliver(pbatch, self._adapter.fetch(phandle))
            except BaseException as e:  # noqa: BLE001
                self._fail(pbatch, e)

    def _finish(self, req: Request) -> None:
        """Set done under the abandonment lock: a caller that raced its
        timeout against this finish is reconciled in the pending counter."""
        with self._abandoned_lock:
            if req.abandoned:
                self._abandoned_pending = max(0, self._abandoned_pending - 1)
            req.done.set()
