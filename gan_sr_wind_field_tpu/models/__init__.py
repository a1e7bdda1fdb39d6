from gan_sr_wind_field_tpu.models.generator import Generator3D
from gan_sr_wind_field_tpu.models.discriminator import Discriminator3D
from gan_sr_wind_field_tpu.models.blocks import RDB, RRDB, ConvLReLU, kaiming_scaled

__all__ = ["Generator3D", "Discriminator3D", "RDB", "RRDB", "ConvLReLU", "kaiming_scaled"]
