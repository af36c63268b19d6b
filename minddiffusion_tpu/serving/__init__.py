"""Production serving: micro-batching engine + stdlib HTTP front end.

A capability the reference lacks entirely (its only inference surface is the
one-shot CLI, stablediffusionv2/txt2img.py); on TPU a long-lived process with
one compiled program and dynamic micro-batching is the natural serving shape.
"""
from minddiffusion_tpu.serving.engine import (
    BatchingEngine, GlideAdapter, SDAdapter)
from minddiffusion_tpu.serving.http_server import make_server

__all__ = ["BatchingEngine", "GlideAdapter", "SDAdapter", "make_server"]
