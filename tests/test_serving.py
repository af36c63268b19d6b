"""Serving engine + HTTP front end, on tiny models (CPU).

The property that matters: a request's image depends only on its own
(prompt, negative_prompt, seed) — never on which other requests it was
micro-batched with or how much repeat-padding the worker added.
"""
import base64
import json
import threading
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from minddiffusion_tpu.pipelines.stable_diffusion import StableDiffusionPipeline
from minddiffusion_tpu.serving import (
    BatchingEngine, GlideAdapter, SDAdapter, make_server)
from tests.test_pipelines import tiny_models


def _tokenize(prompt: str) -> np.ndarray:
    # deterministic toy tokenizer: hash chars into the tiny vocab
    ids = [(3 + ord(c)) % 60 + 1 for c in prompt][:8]
    return np.asarray(ids + [0] * (8 - len(ids)), np.int32)


@pytest.fixture(scope="module")
def engine():
    models = tiny_models()
    params = models.init_params(jax.random.PRNGKey(0), height=64, width=64,
                                context_length=8)
    pipe = StableDiffusionPipeline(models)
    fn = pipe.build_txt2img(height=64, width=64, num_steps=3, sampler="ddim",
                            guidance_scale=7.5, batch_size=4)
    f = models.latent_factor  # tiny VAE: 2, not the SD 8
    adapter = SDAdapter(fn, params, _tokenize, (64 // f, 64 // f))
    eng = BatchingEngine(adapter, batch_size=4, max_wait_ms=30.0).start()
    yield eng
    eng.stop()


def test_submit_returns_image(engine):
    img = engine.submit("a cat", seed=7, timeout=300)
    assert img.shape == (64, 64, 3) and img.dtype == np.uint8


def test_determinism_independent_of_batching(engine):
    # solo request
    solo = engine.submit("a cat", seed=7, timeout=300)

    # same request racing 5 concurrent others (forces mixed batches + padding)
    results = {}
    def worker(name, prompt, seed):
        results[name] = engine.submit(prompt, seed=seed, timeout=300)
    threads = [threading.Thread(target=worker, args=(f"other{i}", f"dog {i}", i))
               for i in range(5)]
    threads.append(threading.Thread(target=worker, args=("cat", "a cat", 7)))
    for t in threads:
        t.start()
    for t in threads:
        t.join()

    np.testing.assert_array_equal(solo, results["cat"])
    # different seeds genuinely differ
    assert not np.array_equal(results["other0"], results["other1"])
    assert engine.requests_served >= 7


def test_http_roundtrip(engine):
    srv = make_server(engine, host="127.0.0.1", port=0,
                      info={"family": "test"})
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/txt2img",
            data=json.dumps({"prompt": "a cat", "seed": 7}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=300) as resp:
            payload = json.loads(resp.read())
        png = base64.b64decode(payload["image_png_b64"])
        assert png[:8] == b"\x89PNG\r\n\x1a\n"
        assert payload["seed"] == 7

        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/healthz", timeout=30) as resp:
            health = json.loads(resp.read())
        assert health["ok"] and health["requests_served"] >= 1

        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/v1/info", timeout=30) as resp:
            assert json.loads(resp.read()) == {"family": "test"}

        # HTTP result matches the direct-submit result for the same seed
        from PIL import Image
        import io
        img_http = np.asarray(Image.open(io.BytesIO(png)))
        np.testing.assert_array_equal(img_http,
                                      engine.submit("a cat", seed=7, timeout=300))
    finally:
        srv.shutdown()
        srv.server_close()


def test_bad_request_400(engine):
    srv = make_server(engine, host="127.0.0.1", port=0)
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/txt2img", data=b"{}",
            headers={"Content-Type": "application/json"})
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(req, timeout=30)
        assert e.value.code == 400
    finally:
        srv.shutdown()
        srv.server_close()


def test_glide_engine_determinism():
    """GLIDE cascade serving: per-request seeds drive per-row uncond tokens,
    x_T, and ancestral noise (row_seeds input) — a request's image must not
    depend on batch composition."""
    from minddiffusion_tpu.pipelines.glide_cascade import (
        GlideCascadePipeline, GlideModels)
    from tests.test_glide import tiny_unet, tiny_xf

    models = GlideModels.create(
        dtype=jnp.float32, base_respacing="4", sr_respacing="3",
        base_unet=tiny_unet(), sr_unet=tiny_unet(in_channels=6),
        xf=tiny_xf(), with_srgan=False,
    )
    params = models.init_params(jax.random.PRNGKey(0), base_size=16, sr_size=32)
    fn = GlideCascadePipeline(models).build_generate(
        batch_size=2, base_size=16, sr_size=32)

    def tok_pair(prompt):
        ids = _tokenize(prompt)
        return ids, (ids != 0).astype(np.int32)

    eng = BatchingEngine(GlideAdapter(fn, params, tok_pair, stage="super_res"),
                         batch_size=2, max_wait_ms=30.0).start()
    try:
        solo = eng.submit("a cat", seed=7, timeout=600)
        assert solo.shape == (32, 32, 3) and solo.dtype == np.uint8

        results = {}
        t1 = threading.Thread(target=lambda: results.update(
            cat=eng.submit("a cat", seed=7, timeout=600)))
        t2 = threading.Thread(target=lambda: results.update(
            dog=eng.submit("a dog", seed=9, timeout=600)))
        t1.start(); t2.start(); t1.join(); t2.join()
        np.testing.assert_array_equal(solo, results["cat"])

        # different seed, same prompt -> different image
        other = eng.submit("a cat", seed=8, timeout=600)
        assert not np.array_equal(solo, other)
    finally:
        eng.stop()


def test_invalid_seed_fails_only_its_own_caller(engine):
    """Validation runs in prepare() on the caller thread — a bad request must
    raise locally and never poison a co-batched one."""
    with pytest.raises(ValueError):
        engine.submit("a cat", seed=-1, timeout=30)
    img = engine.submit("a cat", seed=7, timeout=300)  # engine still healthy
    assert img.shape == (64, 64, 3)


def test_http_non_object_json_is_400(engine):
    srv = make_server(engine, host="127.0.0.1", port=0)
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        for body in (b'"hello"', b"[1,2]",
                     b'{"prompt": "x", "seed": -4}',
                     b'{"prompt": "x", "seed": "NaN"}'):
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/v1/txt2img", data=body,
                headers={"Content-Type": "application/json"})
            with pytest.raises(urllib.error.HTTPError) as e:
                urllib.request.urlopen(req, timeout=30)
            assert e.value.code == 400, body
    finally:
        srv.shutdown()
        srv.server_close()


def test_engine_under_concurrent_load(engine):
    """40 concurrent requests over a batch-4 program: all served, each
    deterministic by its own seed (spot-check duplicates across batches)."""
    results = [None] * 40
    def worker(i):
        results[i] = engine.submit(f"prompt {i % 5}", seed=i % 5, timeout=600)
    threads = [threading.Thread(target=worker, args=(i,)) for i in range(40)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert all(r is not None and r.shape == (64, 64, 3) for r in results)
    # same (prompt, seed) pairs must agree wherever they landed
    for i in range(40):
        np.testing.assert_array_equal(results[i], results[i % 5])


def test_http_falsy_invalid_seed_is_400(engine):
    """'' / [] / false seeds must 400, not silently coerce to seed 0
    (code-review r2: the old `or 0` short-circuited before int())."""
    srv = make_server(engine, host="127.0.0.1", port=0)
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        for seed in ('""', "[]", "{}", "false", "null"):
            body = ('{"prompt": "x", "seed": %s}' % seed).encode()
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/v1/txt2img", data=body,
                headers={"Content-Type": "application/json"})
            if seed == "null":  # explicit null means "default", allowed
                with urllib.request.urlopen(req, timeout=300) as resp:
                    assert json.loads(resp.read())["seed"] == 0
                continue
            with pytest.raises(urllib.error.HTTPError) as e:
                urllib.request.urlopen(req, timeout=30)
            assert e.value.code == 400, seed
    finally:
        srv.shutdown()
        srv.server_close()


def test_worker_fault_is_batch_execution_error():
    """A failure inside adapter.run must surface as BatchExecutionError
    (-> HTTP 500), never as the worker's raw exception class (a ValueError
    there would masquerade as a client 400)."""
    from minddiffusion_tpu.serving.engine import BatchExecutionError

    class BoomAdapter:
        def prepare(self, prompt, negative_prompt, seed):
            return {"x": np.zeros(1)}

        def run(self, payloads):
            raise ValueError("ragged batch")  # a server-side fault

    eng = BatchingEngine(BoomAdapter(), batch_size=2, max_wait_ms=5.0).start()
    try:
        with pytest.raises(BatchExecutionError):
            eng.submit("a cat", seed=1, timeout=30)
    finally:
        eng.stop()


def test_pipelined_dispatch_overlaps_fetch():
    """Split dispatch/fetch adapters must run double-buffered: the worker
    dispatches batch N+1 BEFORE fetching batch N (the r4i ~22 ms/batch
    dispatch-gap recovery), and every request still gets its own result."""
    calls = []

    class SplitAdapter:
        def prepare(self, prompt, negative_prompt, seed):
            return {"seed": seed}

        def dispatch(self, payloads):
            calls.append("dispatch")
            return [p["seed"] for p in payloads]

        def fetch(self, handle):
            calls.append("fetch")
            return np.full((len(handle), 2, 2, 3), handle[0], np.uint8)

    eng = BatchingEngine(SplitAdapter(), batch_size=1, max_wait_ms=1.0)
    results = {}
    threads = [threading.Thread(
        target=lambda s=s: results.update({s: eng.submit("p", seed=s,
                                                         timeout=30)}))
               for s in (3, 5)]
    for t in threads:
        t.start()
    import time as _time
    _time.sleep(0.2)   # both requests queued before the worker starts
    eng.start()
    for t in threads:
        t.join()
    eng.stop()
    # two size-1 batches: the second dispatch precedes the first fetch
    assert calls[:3] == ["dispatch", "dispatch", "fetch"], calls
    assert results[3][0, 0, 0] == 3 and results[5][0, 0, 0] == 5


def test_pipelined_fetch_error_attributed_to_its_own_batch():
    """A device fault surfaces at the blocking fetch — it must fail the
    batch that was fetched, never the one dispatched just before it."""
    from minddiffusion_tpu.serving.engine import BatchExecutionError

    class FlakyAdapter:
        def prepare(self, prompt, negative_prompt, seed):
            return {"seed": seed}

        def dispatch(self, payloads):
            return [p["seed"] for p in payloads]

        def fetch(self, handle):
            if handle[0] == 13:
                raise RuntimeError("device fault")
            return np.full((len(handle), 2, 2, 3), handle[0], np.uint8)

    eng = BatchingEngine(FlakyAdapter(), batch_size=1, max_wait_ms=1.0)
    results, errors = {}, {}

    def worker(s):
        try:
            results[s] = eng.submit("p", seed=s, timeout=30)
        except BatchExecutionError as e:
            errors[s] = e

    threads = [threading.Thread(target=worker, args=(s,)) for s in (13, 7)]
    for t in threads:
        t.start()
    import time as _time
    _time.sleep(0.2)
    eng.start()
    for t in threads:
        t.join()
    eng.stop()
    assert 13 in errors and 13 not in results
    assert results[7][0, 0, 0] == 7 and 7 not in errors


def test_queue_depth_excludes_abandoned():
    """Timed-out requests still sitting in the queue are dead work — the
    /healthz backlog must not count them."""
    import time as _time

    release = threading.Event()

    class SlowAdapter:
        def prepare(self, prompt, negative_prompt, seed):
            return {"i": seed}

        def run(self, payloads):
            release.wait(30)
            return np.zeros((len(payloads), 4, 4, 3), np.uint8)

    eng = BatchingEngine(SlowAdapter(), batch_size=1, max_wait_ms=1.0).start()
    try:
        # first request occupies the worker; the next two wait in the queue
        t = threading.Thread(target=lambda: eng.submit("a", seed=0, timeout=60))
        t.start()
        _time.sleep(0.3)
        for s in (1, 2):
            with pytest.raises(TimeoutError):
                eng.submit("b", seed=s, timeout=0.05)
        assert eng.queue_depth == 0  # both abandoned -> no live backlog
        release.set()
        t.join(timeout=60)
    finally:
        release.set()
        eng.stop()
