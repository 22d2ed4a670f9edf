"""Device-mesh / sharding helpers."""

from graspnet_tpu.parallel.mesh import make_mesh, shard_batch, replicate
from graspnet_tpu.parallel.candidate import (
    candidate_sharded_infer,
    data_parallel_infer,
)
from graspnet_tpu.parallel.distributed import (
    initialize as distributed_initialize,
    global_mesh,
    process_local_batch_slice,
)

__all__ = [
    "make_mesh",
    "shard_batch",
    "replicate",
    "candidate_sharded_infer",
    "data_parallel_infer",
    "distributed_initialize",
    "global_mesh",
    "process_local_batch_slice",
]
