from minddiffusion_tpu.parallel.mesh import (
    MeshConfig,
    assert_tp_effective,
    make_mesh,
    shard_params,
    shard_batch,
    replicate,
    tp_report,
)

__all__ = [
    "MeshConfig", "assert_tp_effective", "make_mesh", "shard_params",
    "shard_batch", "replicate", "tp_report",
]
