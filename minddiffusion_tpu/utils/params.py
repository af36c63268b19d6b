"""Parameter-tree utilities for serving.

`cast_serving_params`: store matmul/conv kernels and embedding tables in the
serving compute dtype (bf16) instead of fp32.

Numerics: every flax module here already casts these weights to the compute
dtype in-graph (`kernel.astype(dtype)` before the MXU op), so the VALUES
entering every matmul/conv are bit-identical either way
(tests/test_models.py::test_cast_serving_params_is_output_preserving).

Measured effect (SD2 512² DDIM-50 b8, v5e): e2e-throughput NEUTRAL
(1.904 vs 1.906 img/s) — the scan's per-step fp32 weight re-read + convert
overlaps with MXU compute, so the HBM-traffic saving buys no wall-clock at
this config. The real win is param HBM residency: 5.2 GB -> 2.6 GB, the
headroom that keeps 768²/b8 and bigger batch/resolution serving configs
off the HBM ceiling.

fp32 islands stay fp32: GroupNorm/LayerNorm affine params and biases are
applied in fp32 by the models (reference keeps norms fp32 under fp16 too —
stablediffusionv2 util.py:90-96, Taichu-GLIDE xf.py:26-33) and are a
negligible fraction of the bytes, so they are left untouched.
"""
from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp

# param leaf names whose tensors only ever enter the graph via
# `.astype(compute_dtype)`: conv/dense kernels and lookup tables
_CAST_LEAF_NAMES: Tuple[str, ...] = (
    "kernel",
    "embedding",
    "token_embedding",
    "positional_embedding",
    "padding_embedding",
    "lora_a",
    "lora_b",
)


def _leaf_name(path) -> str:
    last = path[-1]
    return getattr(last, "key", getattr(last, "name", str(last)))


def cast_serving_params(params: Any, dtype: Any = jnp.bfloat16) -> Any:
    """Cast the heavy weight leaves of a param tree to the serving dtype.

    Leaves named in `_CAST_LEAF_NAMES` with a float dtype are cast; biases
    and norm scales (fp32 application paths) are left as-is. Safe for
    training resume only after casting back — intended for inference.
    """

    def cast(path, x):
        if _leaf_name(path) in _CAST_LEAF_NAMES and jnp.issubdtype(
            x.dtype, jnp.floating
        ):
            return x.astype(dtype)
        return x

    return jax.tree_util.tree_map_with_path(cast, params)
