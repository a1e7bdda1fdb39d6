"""Discriminator3D — VGG-style 3D conv discriminator.

TPU-native counterpart of the reference discriminator
(CNN_models/Discriminator_3D.py:15-193):

- 5 strided blocks 1×→2×→4×→8×→8× base features, each halving x,y;
  z is halved only in the last block (for z ≤ 19 layers),
- ``enable_slicing`` swaps blocks 3-4 for a shallower head
  (block 3 + two stride-1/-(1,1,2) convs) sized for 64×64 patches,
- batch-norm everywhere except the very first conv,
- channel Dropout3d → flatten → Linear(→100) → LeakyReLU → Linear(→1) logit.

Takes only the 3 wind channels (in_num_ch=3). Returns float32 logits (N,).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from gan_sr_wind_field_tpu.models.blocks import (
    ConvLReLU,
    DiscriminatorBlock,
    kaiming_scaled,
)


def remainder_z_layers(number_of_z_layers: int):
    """z-extent bookkeeping per block (reference Discriminator_3D.py:55-64)."""
    rem = [number_of_z_layers]
    for i in range(5):
        if i == 0 and number_of_z_layers <= 19:
            rem.append(number_of_z_layers)
        elif i in {1, 2, 3}:
            rem.append(rem[i])
        else:
            rem.append(rem[i] // 2 + rem[i] % 2)
    return rem


class Discriminator3D(nn.Module):
    in_channels: int = 3
    base_features: int = 32
    feat_kern_size: int = 3
    norm: str = "batch"
    negative_slope: float = 0.2
    number_of_z_layers: int = 10
    enable_slicing: bool = False
    dropout_probability: float = 0.2
    init_scale: float = 0.2
    dtype: Optional[Any] = None
    conv_mode: str = "3D"

    @nn.compact
    def __call__(self, x, train: bool = True, rng_key=None, features_only=False):
        cdt = self.dtype or jnp.float32
        x = x.astype(cdt)
        nf = self.base_features
        rem = remainder_z_layers(self.number_of_z_layers)
        halve_z_first = self.number_of_z_layers > 19

        block_specs = [
            (nf, True, halve_z_first),
            (nf * 2, False, False),
            (nf * 4, False, False),
        ]
        if not self.enable_slicing:
            block_specs += [(nf * 8, False, False), (nf * 8, False, True)]
        else:
            block_specs += [(nf * 8, False, False)]

        for i, (feats, drop_norm, halve_z) in enumerate(block_specs):
            x = DiscriminatorBlock(
                features=feats,
                feat_kern_size=self.feat_kern_size,
                norm=self.norm,
                drop_first_norm=drop_norm,
                halve_z=halve_z,
                negative_slope=self.negative_slope,
                init_scale=self.init_scale,
                dtype=self.dtype,
                conv_mode=self.conv_mode,
                name=f"block{i}",
            )(x, train=train)

        if self.enable_slicing:
            # shallow head (reference Discriminator_3D.py:137-169)
            x = ConvLReLU(
                features=nf * 8,
                kernel_size=self.feat_kern_size,
                strides=1,
                padding=1,
                norm="batch",
                negative_slope=self.negative_slope,
                init_scale=self.init_scale,
                dtype=self.dtype,
                conv_mode=self.conv_mode,
                name="head_conv0",
            )(x, train=train)
            x = ConvLReLU(
                features=nf * 8,
                kernel_size=self.feat_kern_size,
                strides=(1, 1, 2),
                padding=1,
                norm="batch",
                negative_slope=self.negative_slope,
                init_scale=self.init_scale,
                dtype=self.dtype,
                conv_mode=self.conv_mode,
                name="head_conv1",
            )(x, train=train)

        if features_only:
            # frozen-feature perceptual head (use_D_feature_extractor_cost,
            # reference wind_field_GAN_3D.py:370-375,577-583)
            return x.astype(jnp.float32)

        x = nn.Dropout(
            rate=self.dropout_probability,
            broadcast_dims=(1, 2, 3),
            deterministic=not train or self.dropout_probability == 0.0,
        )(x, rng=rng_key)
        x = x.reshape((x.shape[0], -1))
        x = nn.Dense(
            100,
            kernel_init=kaiming_scaled(self.init_scale),
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="fc0",
        )(x)
        x = nn.leaky_relu(x, negative_slope=self.negative_slope)
        x = nn.Dense(
            1,
            kernel_init=kaiming_scaled(self.init_scale),
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="fc1",
        )(x)
        return x.astype(jnp.float32).squeeze(-1)
