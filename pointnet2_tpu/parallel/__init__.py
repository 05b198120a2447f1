from pointnet2_tpu.parallel.mesh import (
    batch_sharding,
    create_mesh,
    replicated_sharding,
    shard_batch,
)
from pointnet2_tpu.parallel.sharded_ops import (
    densify_labels_sharded,
    knn_sharded,
    three_nn_sharded,
)

__all__ = [
    "create_mesh",
    "batch_sharding",
    "replicated_sharding",
    "shard_batch",
    "densify_labels_sharded",
    "knn_sharded",
    "three_nn_sharded",
]
