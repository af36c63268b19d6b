"""Device mesh + sharding rules (jax.sharding, NamedSharding, pjit).

Replaces the reference's entire HCCL rank-table machinery
(scripts/run_train_parallel.sh:55-84 env plumbing, ldm/modules/train/
utils.py:54-108 group creation, cell_wrapper.py:183 grad_reducer AllReduce)
with the TPU-native recipe: build a Mesh, annotate shardings, let XLA insert
the collectives over ICI.

Axes:
  * "dp"   — data parallel: batch sharded, params replicated. The only
    strategy the reference exercises (ParallelMode.DATA_PARALLEL,
    run_train.py:58-62). Gradient psum is implicit in pjit's partitioning.
  * "fsdp" — optimizer/param sharding (ZeRO-ish): each tensor is sharded on
    its largest divisible axis; XLA all-gathers weights per layer and
    reduce-scatters grads. This realizes the reference's *declared-but-dormant*
    optimizer_shard flag (parallel_config.py:31, cell_wrapper.py:215-217).
  * "tp"   — reserved tensor-parallel axis for the attention-head sharding the
    reference ships dead code for (parallel_transformer.py:641-868); size 1
    until a model opts in.

Multi-host: `jax.distributed.initialize()` auto-discovers TPU pod topology —
no RANK_TABLE_FILE equivalent exists or is needed.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    dp: int = -1   # -1: all remaining devices
    fsdp: int = 1
    tp: int = 1

    def resolve(self, n_devices: Optional[int] = None) -> "MeshConfig":
        n = n_devices if n_devices is not None else len(jax.devices())
        dp = self.dp if self.dp != -1 else n // (self.fsdp * self.tp)
        assert dp * self.fsdp * self.tp == n, (
            f"mesh {dp}x{self.fsdp}x{self.tp} != {n} devices"
        )
        return MeshConfig(dp=dp, fsdp=self.fsdp, tp=self.tp)


def make_mesh(config: MeshConfig = MeshConfig(), devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    cfg = config.resolve(len(devices))
    arr = np.asarray(devices).reshape(cfg.dp, cfg.fsdp, cfg.tp)
    return Mesh(arr, axis_names=("dp", "fsdp", "tp"))


# Tensor-parallel rules (live when mesh tp > 1): Megatron-style column/row
# split of the attention and FF projections — the capability the reference
# declares but never instantiates (parallel_transformer.py:641-868).
_TP_COL = ("to_q", "to_k", "to_v", "qkv", "mlp_fc", "geglu", "encoder_kv")
_TP_ROW = ("to_out", "out_proj", "mlp_proj")


def _tp_dim(path_str: str, shape) -> int | None:
    """Which dim (if any) the tp axis shards for this param."""
    if len(shape) != 2:
        return None
    if any(f"/{k}/" in path_str or f"'{k}'" in path_str for k in _TP_COL):
        return 1  # column parallel: split output features
    if any(f"/{k}/" in path_str or f"'{k}'" in path_str for k in _TP_ROW):
        return 0  # row parallel: split input features
    return None


def _param_spec(path_str: str, leaf: Any, mesh: Mesh) -> P:
    """Sharding rule: optional tp split on attention/FF projections, then
    FSDP on the largest remaining divisible axis."""
    fsdp = mesh.shape["fsdp"]
    tp = mesh.shape["tp"]
    shape = getattr(leaf, "shape", ())
    if not shape:
        return P()
    spec = [None] * len(shape)
    if tp > 1:
        td = _tp_dim(path_str, shape)
        if td is not None and shape[td] % tp == 0:
            spec[td] = "tp"
    if fsdp > 1:
        best, best_size = None, 0
        for i, d in enumerate(shape):
            if spec[i] is None and d % fsdp == 0 and d > best_size:
                best, best_size = i, d
        if best is not None:
            spec[best] = "fsdp"
    return P(*spec)


def _path_str(path) -> str:
    return "/" + "/".join(str(getattr(k, "key", k)) for k in path) + "/"


def tp_report(params, mesh: Mesh) -> dict:
    """What the tp axis actually shards, as data (names + byte coverage).

    The sharding rules key on module-name fragments (_TP_COL/_TP_ROW), which
    silently stop matching if a module is renamed — a tp>1 mesh would then run
    correct-but-replicated. This report makes that failure observable: it
    returns the tp-sharded param names and the fraction of 2D-projection bytes
    they cover, and `shard_params`/`param_shardings` assert on it when tp>1.
    """
    names, tp_bytes, total_2d_bytes = [], 0, 0
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        shape = getattr(leaf, "shape", ())
        nbytes = int(np.prod(shape)) * jnp_itemsize(leaf) if shape else 0
        if len(shape) == 2:
            total_2d_bytes += nbytes
        spec = _param_spec(_path_str(path), leaf, mesh)
        if "tp" in tuple(spec):
            names.append(_path_str(path))
            tp_bytes += nbytes
    frac = tp_bytes / total_2d_bytes if total_2d_bytes else 0.0
    return {"tp_params": len(names), "names": names,
            "tp_bytes": tp_bytes, "total_2d_bytes": total_2d_bytes,
            "bytes_fraction": frac}


def jnp_itemsize(leaf) -> int:
    dt = getattr(leaf, "dtype", None)
    return np.dtype(dt).itemsize if dt is not None else 4


def assert_tp_effective(params, mesh: Mesh, min_bytes_fraction: float = 0.15):
    """Fail loudly if a tp>1 mesh would leave the model (near-)replicated.

    Guards against the name-substring rules degrading to no-op on a module
    rename (a tp=2 run with zero matches is numerically correct but wastes
    half the chips). Threshold is deliberately low: attention/FF projections
    are well over 15% of any transformer-bearing model's 2D bytes.
    """
    if mesh.shape.get("tp", 1) <= 1:
        return None
    rep = tp_report(params, mesh)
    if rep["tp_params"] == 0 or rep["bytes_fraction"] < min_bytes_fraction:
        raise ValueError(
            f"tp={mesh.shape['tp']} mesh but only {rep['tp_params']} params "
            f"({rep['bytes_fraction']:.1%} of 2D bytes) matched the TP rules "
            f"(_TP_COL/_TP_ROW name fragments in parallel/mesh.py). A module "
            f"rename has likely broken the sharding rules; the run would be "
            f"silently replicated over the tp axis.")
    return rep


def shard_params(params, mesh: Mesh):
    """Place a param pytree on the mesh (tp + FSDP rules; replicated on dp)."""
    assert_tp_effective(params, mesh)
    return jax.tree_util.tree_map_with_path(
        lambda p, l: jax.device_put(
            l, NamedSharding(mesh, _param_spec(_path_str(p), l, mesh))),
        params)


def param_shardings(params, mesh: Mesh):
    """NamedSharding pytree matching shard_params (for jit in/out shardings)."""
    assert_tp_effective(params, mesh)
    return jax.tree_util.tree_map_with_path(
        lambda p, l: NamedSharding(mesh, _param_spec(_path_str(p), l, mesh)),
        params)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch axis split over dp×fsdp jointly (fsdp also consumes data)."""
    return NamedSharding(mesh, P(("dp", "fsdp")))


def shard_batch(batch, mesh: Mesh):
    return jax.tree.map(lambda x: jax.device_put(x, batch_sharding(mesh)), batch)


def replicate(tree, mesh: Mesh):
    return jax.tree.map(lambda x: jax.device_put(x, NamedSharding(mesh, P())), tree)
