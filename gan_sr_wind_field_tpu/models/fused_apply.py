"""Inference-path generator forward with the fused Pallas RRDB trunk.

``generate_fused(G, params, lr, z)`` reproduces ``Generator3D.apply(...,
train=False)`` (models/generator.py) exactly, but runs the trunk — the
dominant cost — as the single fused kernel in ops/pallas/rdb_trunk.py.
The head/tail layers (feature conv, lr_conv + long skip, upsampling convs,
terrain branch, HR convs) stay plain XLA convs: they are few, large-channel,
and already MXU-friendly.

Forward-only (dropout off, as in every reference no-grad G forward:
wind_field_GAN_3D.py:590-592, test.py:144). Used by the D train branch,
validation/test SR, and serving. The differentiable G update keeps the flax
module whose VJP is free.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from gan_sr_wind_field_tpu.ops.pallas.rdb_trunk import (
    fused_rrdb_trunk,
    pack_trunk_params,
    trunk_fusable,
)
from gan_sr_wind_field_tpu.ops.resize import upsample_nearest_xy

_DN = ("NDHWC", "DHWIO", "NDHWC")


def fused_supported(G, lr_shape) -> bool:
    """Static check that the fused path reproduces this generator config."""
    return trunk_fusable(
        G.num_rdb_convs,
        G.rdb_growth_channels,
        G.lff_kern_size,
        G.conv_mode,
        lr_shape[1:4],
    )


def generator_forward(G, params, lr, z_terrain, trunk_fn,
                      train: bool = False, dropout_key=None):
    """Raw-JAX generator forward with a pluggable trunk.

    trunk_fn(x) runs the RRDB trunk on the feature tensor; everything else
    (head, long skip, upsampling, terrain branch, HR convs, channel
    dropout) matches Generator3D.__call__ layer by layer.

    NOTE on hr_conv0 (the 144→144 k=5³ conv, 55 ms/step in-graph — the
    biggest remaining op): a fused Pallas kernel was prototyped and parity-
    tested, but XLA's schedule already BEATS the lane-padded MXU ideal
    (55 ms vs 62 ms at 56% N-padding), the kernel's best case (~45 ms:
    terrain branch + 16-channel remainder overheads) gains only ~2-3%
    blended, and its ~170-matmul unrolled body compiled pathologically
    slowly under Mosaic. Deliberately kept on XLA.
    """
    cdt = G.dtype or jnp.float32

    def conv(v, w, pad):
        return jax.lax.conv_general_dilated(
            v, w.astype(cdt), window_strides=(1, 1, 1),
            padding=[(pad, pad)] * 3, dimension_numbers=_DN,
        )

    def lrelu(v):
        return jax.nn.leaky_relu(v, negative_slope=G.negative_slope)

    x = conv(lr.astype(cdt), params["feature_conv"]["Conv_0"]["kernel"], 1)

    trunk = trunk_fn(x)
    trunk = conv(trunk, params["lr_conv"]["Conv_0"]["kernel"], 1)
    x = x + trunk  # SkipConnectionBlock

    for i in range(int(math.floor(math.log2(G.upscale)))):
        x = upsample_nearest_xy(x, 2)
        x = lrelu(conv(x, params[f"upconv{i}"]["Conv_0"]["kernel"], 1))

    t = z_terrain.astype(cdt)
    t = lrelu(conv(t, params["terrain_conv0"]["Conv_0"]["kernel"], 1))
    t = conv(t, params["terrain_conv1"]["Conv_0"]["kernel"], 1)

    hp = (G.hr_kern_size - 1) // 2
    if G.split_hr_concat:
        x = lrelu(
            conv(x, params["hr_conv0_x"]["kernel"], hp)
            + conv(t, params["hr_conv0_t"]["kernel"], hp)
        )
    else:
        x = lrelu(conv(
            jnp.concatenate([x, t], axis=-1),
            params["hr_conv0"]["Conv_0"]["kernel"], hp,
        ))
    # channel dropout (torch Dropout3d semantics, flax Dropout
    # broadcast_dims=(1,2,3)): zero whole channels, rescale the rest
    p = G.dropout_probability
    if train and p > 0.0:
        keep = jax.random.bernoulli(
            dropout_key, 1.0 - p, (x.shape[0], 1, 1, 1, x.shape[-1])
        )
        x = jnp.where(keep, x / (1.0 - p), 0.0).astype(cdt)
    if getattr(G, "tap_stacked_hr", False) and G.hr_kern_size > 1:
        from gan_sr_wind_field_tpu.ops.tap_conv import tap_stacked_conv3d

        x = tap_stacked_conv3d(
            x, params["hr_conv1"]["kernel"].astype(cdt), hp
        )
    else:
        x = conv(x, params["hr_conv1"]["kernel"], hp)
    x = x + params["hr_conv1"]["bias"].astype(cdt)
    return x.astype(jnp.float32)


def generate_fused(G, params, lr, z_terrain, interpret: bool = False):
    """Eval-mode generator forward; numerics match G.apply(train=False)."""
    cdt = G.dtype or jnp.float32

    def trunk_fn(x):
        packed = pack_trunk_params(
            params, G.num_rrdb, G.num_rdb_convs, G.num_features,
            G.rdb_growth_channels, cdt,
        )
        return fused_rrdb_trunk(
            packed, x,
            gc=G.rdb_growth_channels,
            num_convs=G.num_rdb_convs,
            rdb_scale=G.rdb_residual_scaling,
            rrdb_scale=G.rrdb_residual_scaling,
            negative_slope=G.negative_slope,
            interpret=interpret,
        )

    return generator_forward(G, params, lr, z_terrain, trunk_fn)
