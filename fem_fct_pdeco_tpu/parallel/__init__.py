from fem_fct_pdeco_tpu.parallel.padding import (
    mesh_padded_n,
    pad_field,
    unpad_field,
)
from fem_fct_pdeco_tpu.parallel.sharding import (
    field_sharding,
    make_mesh,
    shard_field,
    traj_sharding,
)

__all__ = [
    "make_mesh", "field_sharding", "traj_sharding", "shard_field",
    "mesh_padded_n", "pad_field", "unpad_field",
]
