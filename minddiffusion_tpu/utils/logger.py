"""Structured KV training logger + wall-clock profiling contexts.

Rebuilt equivalent of the reference's OpenAI-logger port
(Taichu-GLIDE/model/glide_text2im/train/logger.py:36-328): `logkv`,
`logkv_mean`, `dumpkvs` with pluggable Human/JSON/CSV writers, rank-0-only by
default, plus `profile_kv` context timers. TensorBoard is replaced by the
JSONL stream (ingestible anywhere) and `jax.profiler` traces (see
train/loop.py ProfilerCallback) — the TPU-native tracing story.
"""
from __future__ import annotations

import contextlib
import csv
import json
import os
import time
from collections import defaultdict
from typing import Dict, Optional

import jax


class HumanWriter:
    def __init__(self, stream):
        self.stream = stream

    def write(self, kvs: Dict):
        if not kvs:
            return
        items = sorted(kvs.items())
        width = max(len(k) for k, _ in items)
        lines = [f"| {k.ljust(width)} | {_fmt(v)} |" for k, v in items]
        sep = "-" * len(lines[0])
        self.stream.write("\n".join([sep, *lines, sep]) + "\n")
        self.stream.flush()


class JsonWriter:
    def __init__(self, path: str):
        self.f = open(path, "a")

    def write(self, kvs: Dict):
        self.f.write(json.dumps({k: _jsonable(v) for k, v in kvs.items()}) + "\n")
        self.f.flush()


class CsvWriter:
    def __init__(self, path: str):
        self.path = path
        self.keys: list = []

    def write(self, kvs: Dict):
        new_keys = [k for k in kvs if k not in self.keys]
        rows = []
        if os.path.exists(self.path):
            with open(self.path) as f:
                rows = list(csv.DictReader(f))
        if new_keys:
            self.keys.extend(new_keys)
        with open(self.path, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=self.keys)
            w.writeheader()
            for row in rows:
                w.writerow(row)
            w.writerow({k: _jsonable(kvs.get(k, "")) for k in self.keys})


def _fmt(v):
    return f"{v:.5g}" if isinstance(v, float) else str(v)


def _jsonable(v):
    if hasattr(v, "item"):
        try:
            return v.item()
        except Exception:
            return str(v)
    return v


class KVLogger:
    def __init__(self, log_dir: Optional[str] = None, formats=("human", "json"),
                 only_primary: bool = True):
        self.kvs: Dict = {}
        self._means: Dict = defaultdict(lambda: [0.0, 0])
        self.writers = []
        self.enabled = not (only_primary and jax.process_index() != 0)
        if not self.enabled:
            return
        import sys

        for fmt in formats:
            if fmt == "human":
                self.writers.append(HumanWriter(sys.stdout))
            elif fmt == "json":
                assert log_dir, "json format needs log_dir"
                os.makedirs(log_dir, exist_ok=True)
                self.writers.append(JsonWriter(os.path.join(log_dir, "log.jsonl")))
            elif fmt == "csv":
                assert log_dir, "csv format needs log_dir"
                os.makedirs(log_dir, exist_ok=True)
                self.writers.append(CsvWriter(os.path.join(log_dir, "progress.csv")))
            else:
                raise ValueError(f"unknown log format {fmt!r}")

    def logkv(self, key, val):
        self.kvs[key] = val

    def logkv_mean(self, key, val):
        total, count = self._means[key]
        self._means[key] = [total + float(val), count + 1]

    def dumpkvs(self) -> Dict:
        for k, (total, count) in self._means.items():
            self.kvs[k] = total / max(count, 1)
        out = dict(self.kvs)
        if self.enabled:
            for w in self.writers:
                w.write(out)
        self.kvs.clear()
        self._means.clear()
        return out


_DEFAULT: Optional[KVLogger] = None


def configure(log_dir: Optional[str] = None, formats=("human", "json")) -> KVLogger:
    global _DEFAULT
    _DEFAULT = KVLogger(log_dir, formats)
    return _DEFAULT


def get_logger() -> KVLogger:
    global _DEFAULT
    if _DEFAULT is None:
        _DEFAULT = KVLogger(formats=("human",))
    return _DEFAULT


@contextlib.contextmanager
def profile_kv(name: str, logger: Optional[KVLogger] = None):
    """Accumulate wall-clock into `time/<name>` (reference profile_kv)."""
    t0 = time.time()
    try:
        yield
    finally:
        (logger or get_logger()).logkv_mean(f"time/{name}", time.time() - t0)
