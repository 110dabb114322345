from fem_fct_pdeco_tpu.parallel.sharding import (
    field_sharding,
    make_mesh,
    shard_field,
    traj_sharding,
)

__all__ = ["make_mesh", "field_sharding", "traj_sharding", "shard_field"]
