"""Generator3D — RRDB ESRGAN-3D super-resolution generator.

TPU-native counterpart of the reference generator
(CNN_models/Generator_3D_Resnet_ESRGAN.py:23-229):

LR (N, x, y, z, C_in)
  → feature_conv (3×3×3, C_in→nf, no act)
  → skip( num_RRDB × RRDB → lr_conv )                 # long residual
  → ⌊log2(scale)⌋ × [nearest ×(2,2,1) upsample → conv3 → lrelu]
Z  (N, X, Y, z, 1) at HR resolution
  → terrain_convs: conv3(1→tnf)+lrelu → conv3(tnf→tnf)
concat(channel) → hr_conv(k⁵)+lrelu → channel Dropout3d → hr_conv(k⁵)→3ch

Upsampling is horizontal-only ((2,2,1) — z is never upscaled), non-power-of-2
scales round down (reference :201-206). All convs bias-free except the final
HR conv (torch Conv3d default bias). Compute dtype is bf16-able; the module
returns float32.
"""

from __future__ import annotations

import math
from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from gan_sr_wind_field_tpu.models.blocks import (
    ConvLReLU,
    RRDB,
    _pad_triple,
    _triple,
    kaiming_scaled,
)
from gan_sr_wind_field_tpu.ops.resize import upsample_nearest_xy


class Generator3D(nn.Module):
    in_channels: int = 4
    out_channels: int = 3
    num_features: int = 128
    num_rrdb: int = 16
    upscale: int = 4
    hr_kern_size: int = 5
    num_rdb_convs: int = 5
    rdb_growth_channels: int = 32
    lff_kern_size: int = 1
    rdb_residual_scaling: float = 0.2
    rrdb_residual_scaling: float = 0.2
    negative_slope: float = 0.2
    terrain_features: int = 16
    dropout_probability: float = 0.0
    init_scale: float = 0.1  # weight_init_scale (cfg generator.weight_init_scale)
    dtype: Optional[Any] = None  # compute dtype, e.g. jnp.bfloat16
    # rematerialise each RRDB in the backward pass: trades ~30% more FLOPs for
    # ~25× less activation memory in the trunk — the standard TPU HBM lever
    remat: bool = False
    # '3D' (shared-weight Conv3D) or 'horizontal_3D' (per-z-window unshared
    # weights, reference torch_blocks.py:49-155)
    conv_mode: str = "3D"
    # compute hr_conv0 as conv(x)+conv(t) instead of conv(concat(x,t)):
    # identical math (convolution is linear in input channels) but skips
    # materialising the 144-channel concat at HR resolution — profiled at
    # ~30% of the forward pass on v5e (a pure layout/copy fusion)
    split_hr_concat: bool = True
    # final 144→3 conv via the tap-stacked reformulation (ops/tap_conv.py):
    # 3 output channels waste 98% of the MXU lanes; stacking the xy taps
    # into N recovers it (30 → ~2 ms measured). Same math and params.
    tap_stacked_hr: bool = True
    # run hr_conv0+lrelu+dropout as the channel-split Pallas head kernel
    # (ops/pallas/hr_head.py) on the fused forward paths
    # (models/fused_apply.py) — the flax __call__ itself keeps XLA
    pallas_head: bool = False
    # compute hr_conv0_x's forward as a full-lane 128-out conv plus a
    # tap-stacked 16-out remainder (ops/tap_conv.py:conv3d_split_out):
    # 144 output channels pad to 2 MXU lane tiles on all 125 k=5³ taps;
    # the split costs the same FLOPs at ~1.7× fewer padded MACs. Same
    # params/math; backward keeps the unsplit conv's (full-lane) ops.
    split_hr_out: bool = False

    @nn.compact
    def __call__(self, lr, z_terrain, train: bool = True, rng_key=None):
        """lr: (N,x,y,zl,C_in); z_terrain: (N, x·scale, y·scale, zl, 1)."""
        cdt = self.dtype or jnp.float32
        x = lr.astype(cdt)

        x = ConvLReLU(
            features=self.num_features,
            kernel_size=3,
            padding=1,
            lrelu=False,
            init_scale=self.init_scale,
            dtype=self.dtype,
            conv_mode=self.conv_mode,
            name="feature_conv",
        )(x)

        trunk = x
        rrdb_cls = nn.remat(RRDB) if self.remat else RRDB
        for i in range(self.num_rrdb):
            trunk = rrdb_cls(
                growth_channels=self.rdb_growth_channels,
                num_convs=self.num_rdb_convs,
                lff_kern_size=self.lff_kern_size,
                rdb_residual_scaling=self.rdb_residual_scaling,
                rrdb_residual_scaling=self.rrdb_residual_scaling,
                negative_slope=self.negative_slope,
                init_scale=self.init_scale,
                dtype=self.dtype,
                conv_mode=self.conv_mode,
                name=f"RRDB{i}",
            )(trunk)
        trunk = ConvLReLU(
            features=self.num_features,
            kernel_size=3,
            padding=1,
            lrelu=False,  # reference lr_conv has no activation
            init_scale=self.init_scale,
            dtype=self.dtype,
            conv_mode=self.conv_mode,
            name="lr_conv",
        )(trunk)
        x = x + trunk  # SkipConnectionBlock (torch_blocks.py:40-46)

        n_up = int(math.floor(math.log2(self.upscale)))
        for i in range(n_up):
            x = upsample_nearest_xy(x, 2)
            x = ConvLReLU(
                features=self.num_features,
                kernel_size=3,
                padding=1,
                lrelu=True,
                negative_slope=self.negative_slope,
                init_scale=self.init_scale,
                dtype=self.dtype,
                conv_mode=self.conv_mode,
                name=f"upconv{i}",
            )(x)

        t = z_terrain.astype(cdt)
        t = ConvLReLU(
            features=self.terrain_features,
            kernel_size=3,
            padding=1,
            lrelu=True,
            negative_slope=self.negative_slope,
            init_scale=self.init_scale,
            dtype=self.dtype,
            conv_mode=self.conv_mode,
            name="terrain_conv0",
        )(t)
        t = ConvLReLU(
            features=self.terrain_features,
            kernel_size=3,
            padding=1,
            lrelu=False,
            init_scale=self.init_scale,
            dtype=self.dtype,
            conv_mode=self.conv_mode,
            name="terrain_conv1",
        )(t)

        hr_pad = (self.hr_kern_size - 1) // 2
        hr_feats = self.num_features + self.terrain_features
        if self.split_hr_concat and self.conv_mode == "3D":
            conv_kw = dict(
                features=hr_feats,
                kernel_size=_triple(self.hr_kern_size),
                padding=_pad_triple(hr_pad),
                use_bias=False,
                kernel_init=kaiming_scaled(self.init_scale),
                dtype=self.dtype,
                param_dtype=jnp.float32,
            )
            if self.split_hr_out and self.hr_kern_size > 1:
                from gan_sr_wind_field_tpu.models.blocks import SplitOutConv

                cx = SplitOutConv(
                    features=hr_feats,
                    kernel_size=_triple(self.hr_kern_size),
                    padding=_triple(hr_pad),
                    kernel_init=kaiming_scaled(self.init_scale),
                    dtype=self.dtype,
                    param_dtype=jnp.float32,
                    name="hr_conv0_x",
                )(x)
            else:
                cx = nn.Conv(**conv_kw, name="hr_conv0_x")(x)
            x = cx + nn.Conv(**conv_kw, name="hr_conv0_t")(t)
            x = nn.leaky_relu(x, negative_slope=self.negative_slope)
        else:
            x = jnp.concatenate([x, t], axis=-1)
            x = ConvLReLU(
                features=hr_feats,
                kernel_size=self.hr_kern_size,
                padding=hr_pad,
                lrelu=True,
                negative_slope=self.negative_slope,
                init_scale=self.init_scale,
                dtype=self.dtype,
                conv_mode=self.conv_mode,
                name="hr_conv0",
            )(x)
        # channel dropout (torch Dropout3d): broadcast over spatial dims
        x = nn.Dropout(
            rate=self.dropout_probability,
            broadcast_dims=(1, 2, 3),
            deterministic=not train or self.dropout_probability == 0.0,
        )(x, rng=rng_key)
        if self.conv_mode == "horizontal_3D":
            from gan_sr_wind_field_tpu.models.blocks import HorizontalConv3D

            x = HorizontalConv3D(
                features=self.out_channels,
                kernel_size=self.hr_kern_size,
                padding=(hr_pad, hr_pad, hr_pad),
                init_scale=self.init_scale,
                dtype=self.dtype,
                name="hr_conv1",
            )(x)
        elif self.tap_stacked_hr and self.hr_kern_size > 1:
            # few-output-channel conv via the tap-stacked reformulation
            # (ops/tap_conv.py): same math/params, ~15x faster on the MXU
            from gan_sr_wind_field_tpu.models.blocks import TapStackedConv

            x = TapStackedConv(
                features=self.out_channels,
                kernel_size=_triple(self.hr_kern_size),
                padding=_triple(hr_pad),
                use_bias=True,
                kernel_init=kaiming_scaled(self.init_scale),
                dtype=self.dtype,
                param_dtype=jnp.float32,
                name="hr_conv1",
            )(x)
        else:
            x = nn.Conv(
                features=self.out_channels,
                kernel_size=_triple(self.hr_kern_size),
                padding=_pad_triple(hr_pad),
                use_bias=True,  # final conv keeps torch's default bias
                kernel_init=kaiming_scaled(self.init_scale),
                dtype=self.dtype,
                param_dtype=jnp.float32,
                name="hr_conv1",
            )(x)
        return x.astype(jnp.float32)
