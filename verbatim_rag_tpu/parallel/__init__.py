"""Parallelism: meshes, sharding rules, distributed search, multi-slice init."""

from .distributed import global_mesh, initialize, process_local_batch_slice
from .mesh import (
    data_sharding,
    encoder_param_specs,
    make_mesh,
    replicated,
    row_sharding,
    shard_params,
)
from .sharded_search import (
    replicate,
    shard_rows,
    sharded_dense_topk,
    sharded_sparse_topk,
)

__all__ = [
    "data_sharding",
    "encoder_param_specs",
    "global_mesh",
    "initialize",
    "make_mesh",
    "process_local_batch_slice",
    "replicate",
    "replicated",
    "row_sharding",
    "shard_params",
    "shard_rows",
    "sharded_dense_topk",
    "sharded_sparse_topk",
]
