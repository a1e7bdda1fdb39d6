from gan_sr_wind_field_tpu.ops.pallas.stencil import (
    wind_field_gradient_fused,
    wind_field_gradient_pallas,
)

__all__ = ["wind_field_gradient_fused", "wind_field_gradient_pallas"]
