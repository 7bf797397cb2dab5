from .mesh import (
    SHARD_AXIS,
    BATCH_AXIS,
    init_distributed,
    make_mesh,
    row_sharding,
    replicated,
)
from .sharded import (
    RowShardedOperator,
    ShardedMatrixFreeOperator,
    shard_vector,
)
from .sharded_sparse import RowShardedBellOperator

__all__ = [
    "SHARD_AXIS", "BATCH_AXIS", "init_distributed", "make_mesh",
    "row_sharding", "replicated",
    "RowShardedOperator", "ShardedMatrixFreeOperator", "shard_vector",
    "RowShardedBellOperator",
]
