from .mesh import (
    make_mesh,
    shard_finite_mps,
    shard_infinite_mps,
    shard_env,
    replicate,
)
