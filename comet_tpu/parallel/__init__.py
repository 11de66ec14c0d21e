from .mesh import (
    make_mesh,
    data_sharding,
    replicated,
    shard_batch,
    replicate_params,
    track_sharding,
    cross_replica_mean,
    tensor_parallel_spec,
    shard_params_tp,
)
