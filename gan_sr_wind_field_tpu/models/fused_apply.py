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


def _head_features(G, params, lr, z_terrain, trunk_fn):
    """The generator up to (but not including) hr_conv0: returns the
    HR-resolution feature tensor x and the terrain features t."""
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
    return x, t, conv, lrelu


def generator_forward(G, params, lr, z_terrain, trunk_fn,
                      train: bool = False, dropout_key=None,
                      interpret: bool = False, qhead=None):
    """Raw-JAX generator forward with a pluggable trunk.

    trunk_fn(x) runs the RRDB trunk on the feature tensor; everything else
    (head, long skip, upsampling, terrain branch, HR convs, channel
    dropout) matches Generator3D.__call__ layer by layer.

    hr_conv0 (the 144→144 k=5³ conv — the biggest op outside the trunk)
    optionally runs as the channel-split Pallas head kernel
    (ops/pallas/hr_head.py, ``G.pallas_head``): XLA's direct schedule is
    capped at 56% MXU lane utilisation by the 144→256 lane padding, and a
    v1 per-tap kernel lost to it (~170-matmul body, rejected); the
    8-tap-group channel-split design packs lanes exactly.

    ``qhead``: optional calibrated int8 quantization of hr_conv0's x-part
    (ops/quant.py, serving only — requires split_hr_concat and eval mode);
    the terrain part stays exact.
    """
    cdt = G.dtype or jnp.float32
    x, t, conv, lrelu = _head_features(G, params, lr, z_terrain, trunk_fn)
    if qhead is not None and (train or not G.split_hr_concat):
        raise ValueError(
            "int8 head quantization is a serving-only option and needs "
            "split_hr_concat (terrain part stays exact)"
        )

    hp = (G.hr_kern_size - 1) // 2
    if G.split_hr_concat:
        Wx = params["hr_conv0_x"]["kernel"]
        Wt = params["hr_conv0_t"]["kernel"]
    else:
        W = params["hr_conv0"]["Conv_0"]["kernel"]
        Wx, Wt = W[:, :, :, : x.shape[-1]], W[:, :, :, x.shape[-1]:]

    use_ph = False
    if getattr(G, "pallas_head", False) and qhead is None:
        from gan_sr_wind_field_tpu.ops.pallas.hr_head import (
            head_fusable,
            pick_chunk,
        )

        if interpret:
            # interpret mode has no lane-packing constraints, but the
            # x-chunk geometry gate still applies (pick_chunk can return
            # None for unchunkable X regardless of backend)
            use_ph = pick_chunk(
                x.shape[1], G.hr_kern_size, x.shape[2] * x.shape[3]
            ) is not None
        else:
            use_ph = head_fusable(x.shape, G.hr_kern_size, Wx.shape[-1])

    p = G.dropout_probability
    if use_ph:
        from gan_sr_wind_field_tpu.ops.pallas.hr_head import (
            HeadMeta,
            hr_head,
        )
        from gan_sr_wind_field_tpu.ops.tap_conv import tap_stacked_conv3d

        dmask = None
        if train and p > 0.0:
            # same draw shape as the flax/XLA path → identical masks for
            # the same key (training trajectories coincide)
            keep = jax.random.bernoulli(
                dropout_key, 1.0 - p,
                (x.shape[0], 1, 1, 1, Wx.shape[-1]),
            ).reshape(x.shape[0], Wx.shape[-1])
            dmask = jnp.where(keep, 1.0 / (1.0 - p), 0.0).astype(cdt)
        meta = HeadMeta(
            k=G.hr_kern_size, negative_slope=G.negative_slope, cm=128,
            interpret=interpret,
        )
        h_main, h_rem = hr_head(
            meta, Wx.astype(cdt), Wt.astype(cdt), x, t, dmask
        )
        # hr_conv1 is linear in input channels — run it on the split
        # halves (tap-stacked: 3 output channels) and sum
        W1 = params["hr_conv1"]["kernel"].astype(cdt)
        cm = h_main.shape[-1]
        x = tap_stacked_conv3d(h_main, W1[:, :, :, :cm], hp)
        if h_rem.shape[-1]:
            x = x + tap_stacked_conv3d(h_rem, W1[:, :, :, cm:], hp)
        x = x + params["hr_conv1"]["bias"].astype(cdt)
        return x.astype(jnp.float32)

    if G.split_hr_concat:
        if G.hr_kern_size > 1:
            # terrain part: few (16) input channels — use the conv whose
            # custom VJP tap-stacks the input grad (ops/tap_conv.py;
            # the default 144→16 transposed conv costs 27.7 ms/G-step)
            from gan_sr_wind_field_tpu.ops.tap_conv import conv3d_tap_dx

            if qhead is not None:
                # serving: exact bf16 terrain conv, no VJP machinery needed
                ct = conv(t, Wt, hp)
            elif getattr(G, "split_hr_out", False):
                # output-split forward + tap-stacked input grad combined
                from gan_sr_wind_field_tpu.ops.tap_conv import (
                    conv3d_split_out,
                )

                ct = conv3d_split_out(t, Wt.astype(cdt), hp, tap_dx=True)
            else:
                ct = conv3d_tap_dx(t, Wt.astype(cdt), hp)
        else:
            ct = conv(t, Wt, hp)
        if qhead is not None:
            # calibrated int8 main conv(s): ~1.9x the bf16 MXU rate on the
            # dominant serving op (ops/quant.py; scripts/probe_int8_conv.py)
            from gan_sr_wind_field_tpu.ops.quant import split_head_conv_int8

            cx = split_head_conv_int8(x, qhead, hp, out_dtype=cdt)
        elif getattr(G, "split_hr_out", False) and G.hr_kern_size > 1:
            # full-lane 128-out conv + tap-stacked 16-out remainder
            # (ops/tap_conv.py:conv3d_split_out) — same math, ~1.7× fewer
            # padded MACs than one 144-out conv
            from gan_sr_wind_field_tpu.ops.tap_conv import conv3d_split_out

            cx = conv3d_split_out(x, Wx.astype(cdt), hp)
        else:
            cx = conv(x, Wx, hp)
        x = lrelu(cx + ct)
    else:
        x = lrelu(conv(
            jnp.concatenate([x, t], axis=-1),
            params["hr_conv0"]["Conv_0"]["kernel"], hp,
        ))
    # channel dropout (torch Dropout3d semantics, flax Dropout
    # broadcast_dims=(1,2,3)): zero whole channels, rescale the rest
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


def _fused_trunk_fn(G, params, interpret):
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

    return trunk_fn


def generate_fused(G, params, lr, z_terrain, interpret: bool = False,
                   qhead=None, qtrunk=None):
    """Eval-mode generator forward; numerics match G.apply(train=False)
    (exactly — or up to the calibrated int8 rounding when ``qhead`` /
    ``qtrunk`` are given, see ops/quant.py / ops/quant_trunk.py).

    ``qtrunk`` swaps the bf16 Pallas trunk for the calibrated int8 XLA
    trunk (serving-only measurement path, VERDICT r2 weak 2)."""
    if qtrunk is not None:
        from gan_sr_wind_field_tpu.ops.quant_trunk import trunk_int8_apply

        cdt = G.dtype or jnp.float32
        trunk_fn = lambda x: trunk_int8_apply(qtrunk, x, out_dtype=cdt)
    else:
        trunk_fn = _fused_trunk_fn(G, params, interpret)
    return generator_forward(
        G, params, lr, z_terrain, trunk_fn,
        interpret=interpret, qhead=qhead,
    )


def trunk_input_features(G, params, lr):
    """feature_conv output — the trunk's input tensor (int8-trunk
    calibration probe, ops/quant_trunk.py)."""
    cdt = G.dtype or jnp.float32
    return jax.lax.conv_general_dilated(
        lr.astype(cdt), params["feature_conv"]["Conv_0"]["kernel"].astype(cdt),
        window_strides=(1, 1, 1), padding=[(1, 1)] * 3,
        dimension_numbers=_DN,
    )


def head_features_fused(G, params, lr, interpret: bool = False):
    """The hr_conv0 input feature tensor x for a batch (calibration probe
    for the int8 serving head, ops/quant.py — x depends only on lr, not on
    the terrain branch)."""
    zl = lr.shape[3]
    hr_xy = (lr.shape[1] * G.upscale, lr.shape[2] * G.upscale)
    z_dummy = jnp.zeros(lr.shape[:1] + hr_xy + (zl, 1), jnp.float32)
    x, _, _, _ = _head_features(
        G, params, lr, z_dummy, _fused_trunk_fn(G, params, interpret)
    )
    return x
