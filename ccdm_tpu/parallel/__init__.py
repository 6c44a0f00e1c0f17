from ccdm_tpu.parallel.mesh import (
    MeshConfig,
    batch_sharding,
    make_mesh,
    param_partition_spec,
    shard_train_state,
)

__all__ = [
    "MeshConfig",
    "make_mesh",
    "batch_sharding",
    "param_partition_spec",
    "shard_train_state",
]
