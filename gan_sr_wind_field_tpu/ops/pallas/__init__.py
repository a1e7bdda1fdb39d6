from gan_sr_wind_field_tpu.ops.pallas.stencil import (
    wind_field_gradient_fused,
    wind_field_gradient_pallas,
)
from gan_sr_wind_field_tpu.ops.pallas.rdb_trunk import (
    fused_rrdb_trunk,
    pack_trunk_params,
    trunk_fusable,
)

__all__ = [
    "wind_field_gradient_fused",
    "wind_field_gradient_pallas",
    "fused_rrdb_trunk",
    "pack_trunk_params",
    "trunk_fusable",
]
