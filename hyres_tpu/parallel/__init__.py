from .inference import make_sharded_eval
from .spatial import make_spatial_eval
from .mesh import data_parallel_mesh, replicate, shard_batch
from .multihost import local_batch_slice, maybe_initialize_distributed

__all__ = [
    "data_parallel_mesh",
    "local_batch_slice",
    "make_sharded_eval",
    "make_spatial_eval",
    "maybe_initialize_distributed",
    "replicate",
    "shard_batch",
]
