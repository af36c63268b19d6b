"""LoRA utilities: adapter extraction and merge-for-serving.

The reference keeps LoRA weights separate at inference (txt2img loads the
adapter ckpt on top, wukong txt2img.py:222-225). Merging the low-rank update
into the base kernels removes the adapter matmuls entirely — the merged
params run in the enable_lora=False model at full speed.

Param layout (models/attention.py LoRADense):
    {to_q: {base: {kernel[, bias]}, lora_a (in, r), lora_b (r, out)}}
merged:  {to_q: {kernel = base.kernel + (alpha/r) * lora_a @ lora_b [, bias]}}
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp


def _is_lora_node(node) -> bool:
    return isinstance(node, dict) and "lora_a" in node and "lora_b" in node


def merge_lora_params(params: Any, rank: int = 4, alpha: float = 4.0) -> Any:
    """Fold adapters into base kernels; output matches the non-LoRA model."""
    scale = alpha / rank

    def walk(node):
        if _is_lora_node(node):
            base = dict(node["base"])
            delta = jnp.asarray(node["lora_a"]) @ jnp.asarray(node["lora_b"])
            base["kernel"] = jnp.asarray(base["kernel"]) + scale * delta
            return base
        if isinstance(node, dict):
            return {k: walk(v) for k, v in node.items()}
        return node

    return walk(params)


def extract_lora_params(params: Any) -> Any:
    """Keep only lora_a/lora_b leaves (None elsewhere) — the small-ckpt payload
    (reference TrainableParamsCheckPoint, wukong run_train.py:212-221)."""

    def walk(node):
        if _is_lora_node(node):
            return {"lora_a": node["lora_a"], "lora_b": node["lora_b"]}
        if isinstance(node, dict):
            sub = {k: walk(v) for k, v in node.items()}
            sub = {k: v for k, v in sub.items() if v is not None}
            return sub or None
        return None

    return walk(params) or {}


def apply_lora_params(base_lora_params: Any, adapters: Any) -> Any:
    """Overlay saved adapters onto a fresh enable_lora=True param tree."""

    def walk(node, ad):
        if ad is None:
            return node
        if _is_lora_node(node):
            out = dict(node)
            out["lora_a"] = ad["lora_a"]
            out["lora_b"] = ad["lora_b"]
            return out
        if isinstance(node, dict):
            return {k: walk(v, ad.get(k)) if isinstance(ad, dict) else v
                    for k, v in node.items()}
        return node

    return walk(base_lora_params, adapters)
