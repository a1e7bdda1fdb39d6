from gan_sr_wind_field_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    replicate,
    shard_params,
    shard_state,
    volume_sharding,
)

__all__ = [
    "batch_sharding",
    "make_mesh",
    "replicate",
    "shard_params",
    "shard_state",
    "volume_sharding",
]
