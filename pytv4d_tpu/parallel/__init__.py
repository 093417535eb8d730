from . import mesh
from .mesh import (
    T_AXIS,
    Z_AXIS,
    d_volume_sharding,
    d_volume_spec,
    make_mesh,
    shard_volume,
    volume_sharding,
    volume_spec,
)
