from .mesh import (
    make_mesh,
    data_sharding,
    replicated_sharding,
    put_replicated,
    shard_batch,
    initialize_distributed,
    DATA_AXIS,
)
