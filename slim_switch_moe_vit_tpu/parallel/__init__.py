from .sharding import (  # noqa: F401
    DATA_AXIS,
    EXPERT_AXIS,
    batch_sharding,
    constrain,
    make_mesh,
    replicated,
    shard_params,
)
