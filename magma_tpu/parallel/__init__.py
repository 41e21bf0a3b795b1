from magma_tpu.parallel.mesh import make_mesh
from magma_tpu.parallel.partition import combine, partition
from magma_tpu.parallel.sharding import (
    batch_sharding,
    make_param_shardings,
    shard_params,
)

__all__ = [
    "make_mesh",
    "partition",
    "combine",
    "make_param_shardings",
    "shard_params",
    "batch_sharding",
]
