"""NN building blocks (Flax linen, NDHWC channel-last, bf16-compute ready).

TPU-first re-design of the reference block set
(reference: CNN_models/torch_blocks.py:1-521):

- all convs are `lax.conv_general_dilated` (NDHWC / DHWIO) — XLA lowers these
  onto the MXU; channels-last keeps C on the 128-lane axis (nf=128 fits the
  MXU tile exactly),
- factory-built convs carry **no bias** (reference torch_blocks.py:17),
  the RDB local-feature-fusion conv and final HR conv do,
- weight init is Kaiming-normal fan-in × scale (reference
  tools/initialization.py:15-34) expressed as `variance_scaling`,
- channel-wise Dropout3d == `nn.Dropout` broadcast over all spatial dims,
- LeakyReLU slope 0.2.

Dense (RDB) concatenation order and residual scalings match the reference so
training dynamics are comparable.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


def kaiming_scaled(scale: float = 1.0):
    """Kaiming-normal fan-in init scaled by ``scale``.

    torch ``kaiming_normal_(a=0, mode='fan_in')`` draws std=sqrt(2/fan_in);
    multiplying the weight by ``scale`` afterwards is equivalent to
    variance_scaling with variance 2·scale².
    (reference: tools/initialization.py:15-34)
    """
    return nn.initializers.variance_scaling(
        2.0 * scale * scale, mode="fan_in", distribution="normal"
    )


def _triple(v) -> Tuple[int, int, int]:
    if isinstance(v, (tuple, list)):
        return tuple(v)
    return (v, v, v)


def _pad_triple(p) -> Sequence[Tuple[int, int]]:
    p = _triple(p)
    return [(p[0], p[0]), (p[1], p[1]), (p[2], p[2])]


class HorizontalConv3D(nn.Module):
    """Per-z-window conv with UNSHARED weights across height.

    The reference's experimental ``horizontal_3D`` mode keeps a separate
    Conv3d per vertical window and loops z slices in Python
    (torch_blocks.py:49-155) — z·(number of kernel launches) per layer. Here
    the windows are gathered once and ALL windows run as one vmapped 2D
    convolution batch with a (W, kh, kw, kz, Cin, Cout) weight tensor — a
    single XLA conv feeding the MXU.

    Output z-extent = (Zin − kz + 2·pad_z)//stride_z + 1, one layer per
    window, like the reference's ``forward_horizontal_convs``.
    """

    features: int
    kernel_size: Union[int, Tuple[int, int, int]] = 3
    strides: Union[int, Tuple[int, int, int]] = 1
    padding: Union[int, Tuple[int, int, int]] = None  # None → SAME-ish like ref
    use_bias: bool = False
    init_scale: float = 1.0
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        kh, kw, kz = _triple(self.kernel_size)
        sh, sw, sz = _triple(self.strides)
        if self.padding is None:
            ph = pw = (kh - 1) // 2
            pz = (kz - 1) // 2  # vertical_padding default (torch_blocks.py:107)
        else:
            ph, pw, pz = _triple(self.padding)
        zin = x.shape[3]
        n_windows = (zin - kz + 2 * pz) // sz + 1

        kernel = self.param(
            "kernel",
            kaiming_scaled(self.init_scale),
            (n_windows, kh, kw, kz, x.shape[-1], self.features),
            jnp.float32,
        )
        cdt = self.dtype or x.dtype
        x = x.astype(cdt)
        kernel = kernel.astype(cdt)

        xp = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (pz, pz), (0, 0)))
        # windows: (W, N, X, Y, kz, Cin) → fold kz into channels
        idx = jnp.arange(n_windows) * sz
        wins = jax.vmap(
            lambda z0: jax.lax.dynamic_slice_in_dim(xp, z0, kz, axis=3)
        )(idx)
        W, N, X, Y = wins.shape[:4]
        wins = wins.reshape(W, N, X, Y, kz * x.shape[-1])
        kern2d = kernel.reshape(n_windows, kh, kw, kz * x.shape[-1],
                                self.features)

        def conv_one(xw, kw_):
            return jax.lax.conv_general_dilated(
                xw, kw_, window_strides=(sh, sw),
                padding=[(ph, ph), (pw, pw)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )

        out = jax.vmap(conv_one)(wins, kern2d)  # (W, N, X', Y', Cout)
        return jnp.moveaxis(out, 0, 3)  # (N, X', Y', W, Cout)


class TapStackedConv(nn.Module):
    """Conv3D for few output channels via the tap-stacked reformulation.

    Drop-in for `nn.Conv` — identical param names/shapes (``kernel`` DHWIO,
    optional ``bias``) so checkpoints and the torch interop are unaffected;
    only the computation is reassociated (ops/tap_conv.py: 30 ms → ~2 ms for
    the generator's 144→3 k=5³ final conv on v5e).
    """

    features: int
    kernel_size: Tuple[int, int, int]
    padding: Tuple[int, int, int]
    use_bias: bool = True
    kernel_init: Any = nn.initializers.lecun_normal()
    dtype: Optional[Dtype] = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        from gan_sr_wind_field_tpu.ops.tap_conv import tap_stacked_conv3d

        k = _triple(self.kernel_size)
        kernel = self.param(
            "kernel", self.kernel_init,
            k + (x.shape[-1], self.features), self.param_dtype,
        )
        cdt = self.dtype or x.dtype
        out = tap_stacked_conv3d(
            x.astype(cdt), kernel.astype(cdt), _triple(self.padding)
        )
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.features,),
                self.param_dtype,
            )
            out = out + bias.astype(cdt)
        return out


class SplitOutConv(nn.Module):
    """Bias-free `nn.Conv` drop-in (``kernel`` DHWIO param) whose forward
    runs as a full-lane main conv + tap-stacked remainder conv
    (ops/tap_conv.py:conv3d_split_out). Same params, reassociated compute —
    built for the generator's 128→144 hr_conv0, where 144 output channels
    waste 44% of the padded MXU lanes on all 125 k=5³ taps."""

    features: int
    kernel_size: Tuple[int, int, int]
    padding: Tuple[int, int, int]
    kernel_init: Any = nn.initializers.lecun_normal()
    dtype: Optional[Dtype] = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        from gan_sr_wind_field_tpu.ops.tap_conv import conv3d_split_out

        k = _triple(self.kernel_size)
        kernel = self.param(
            "kernel", self.kernel_init,
            k + (x.shape[-1], self.features), self.param_dtype,
        )
        cdt = self.dtype or x.dtype
        pad = _triple(self.padding)
        assert pad[0] == pad[1] == pad[2], "cubic SAME padding only"
        return conv3d_split_out(x.astype(cdt), kernel.astype(cdt), pad[0])


class ConvLReLU(nn.Module):
    """Conv3D (+BatchNorm/InstanceNorm) (+LeakyReLU), CNA order.

    Mirrors the reference conv factory (torch_blocks.py:5-37): bias-free conv,
    optional norm, optional slope-0.2 LeakyReLU. ``conv_mode='horizontal_3D'``
    swaps in the per-z-window unshared-weight conv.
    """

    features: int
    kernel_size: Union[int, Tuple[int, int, int]] = 3
    strides: Union[int, Tuple[int, int, int]] = 1
    padding: Union[int, Tuple[int, int, int]] = 1
    norm: str = ""  # "", "batch", "instance"
    lrelu: bool = True
    negative_slope: float = 0.2
    use_bias: bool = False
    init_scale: float = 1.0
    dtype: Optional[Dtype] = None  # compute dtype (bf16); params stay f32
    conv_mode: str = "3D"

    @nn.compact
    def __call__(self, x, train: bool = True):
        if self.conv_mode == "horizontal_3D":
            k = _triple(self.kernel_size)
            p = _triple(self.padding)
            x = HorizontalConv3D(
                features=self.features,
                kernel_size=k,
                strides=self.strides,
                padding=(p[0], p[1], p[2]),
                use_bias=self.use_bias,
                init_scale=self.init_scale,
                dtype=self.dtype,
                name="hconv",
            )(x)
        else:
            x = nn.Conv(
                features=self.features,
                kernel_size=_triple(self.kernel_size),
                strides=_triple(self.strides),
                padding=_pad_triple(self.padding),
                use_bias=self.use_bias,
                kernel_init=kaiming_scaled(self.init_scale),
                dtype=self.dtype,
                param_dtype=jnp.float32,
            )(x)
        if self.norm == "batch":
            # torch BatchNorm3d defaults: momentum 0.1 (flax: 0.9), eps 1e-5.
            # Under jit-with-sharding the batch stats are global across the
            # data mesh axis automatically (XLA computes logical-global means).
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                dtype=self.dtype,
                param_dtype=jnp.float32,
            )(x)
        elif self.norm == "instance":
            x = nn.GroupNorm(
                num_groups=None,
                group_size=1,
                epsilon=1e-5,
                use_bias=False,
                use_scale=False,
                dtype=self.dtype,
            )(x)
        elif self.norm:
            raise NotImplementedError(f"Unknown norm type {self.norm!r}")
        if self.lrelu:
            x = nn.leaky_relu(x, negative_slope=self.negative_slope)
        return x


class RDB(nn.Module):
    """Residual Dense Block (reference torch_blocks.py:217-290).

    ``num_convs - 1`` dense conv+lrelu growth layers (concat along C) followed
    by a 1×1×1 (or lff_kern³) local-feature-fusion conv WITH bias, residual
    scaled by ``residual_scaling``.
    """

    growth_channels: int
    num_convs: int = 5
    lff_kern_size: int = 1
    residual_scaling: float = 0.2
    negative_slope: float = 0.2
    init_scale: float = 1.0
    dtype: Optional[Dtype] = None
    conv_mode: str = "3D"
    # segmented dense convs: identical math & params, but each growth conv is
    # computed as a SUM of per-segment convolutions instead of convolving a
    # materialised concat. Measured ~neutral on v5e (XLA already fuses the
    # concats well) — kept as an option for other topologies.
    segmented: bool = False

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        if self.segmented and self.conv_mode == "3D":
            return self._segmented(x, in_features)
        feats = x
        for i in range(self.num_convs - 1):
            out = ConvLReLU(
                features=self.growth_channels,
                kernel_size=3,
                padding=1,
                lrelu=True,
                negative_slope=self.negative_slope,
                init_scale=self.init_scale,
                dtype=self.dtype,
                conv_mode=self.conv_mode,
                name=f"conv{i}",
            )(feats)
            feats = jnp.concatenate([feats, out], axis=-1)
        lff_pad = (self.lff_kern_size - 1) // 2
        residual = nn.Conv(
            features=in_features,
            kernel_size=_triple(self.lff_kern_size),
            padding=_pad_triple(lff_pad),
            use_bias=True,  # reference LFF conv keeps its bias (torch_blocks.py:278)
            kernel_init=kaiming_scaled(self.init_scale),
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="LFF",
        )(feats)
        return residual * self.residual_scaling + x

    def _segmented(self, x, in_features):
        """Concat-free dense block: y_i = Σ_j conv(seg_j, W_i[:, j-slice]).

        Bit-identical math to the concat formulation (convolution is linear
        in its input channels); the concat tensors simply never exist.
        """
        cdt = self.dtype or x.dtype
        gc = self.growth_channels
        dn = ("NHWDC", "HWDIO", "NHWDC")

        def seg_conv(segs, kernel, pad):
            off = 0
            acc = None
            for seg in segs:
                w = jax.lax.slice_in_dim(
                    kernel, off, off + seg.shape[-1], axis=3
                ).astype(cdt)
                off += seg.shape[-1]
                y = jax.lax.conv_general_dilated(
                    seg.astype(cdt), w, window_strides=(1, 1, 1),
                    padding=[(pad, pad)] * 3, dimension_numbers=dn,
                )
                acc = y if acc is None else acc + y
            return acc

        segs = [x]
        for i in range(self.num_convs - 1):
            cin_i = in_features + i * gc
            kernel = self.param(
                f"conv{i}_kernel", kaiming_scaled(self.init_scale),
                (3, 3, 3, cin_i, gc), jnp.float32,
            )
            out = seg_conv(segs, kernel, pad=1)
            segs.append(nn.leaky_relu(out, negative_slope=self.negative_slope))

        cin_lff = in_features + (self.num_convs - 1) * gc
        k = self.lff_kern_size
        lff_kernel = self.param(
            "LFF_kernel", kaiming_scaled(self.init_scale),
            (k, k, k, cin_lff, in_features), jnp.float32,
        )
        lff_bias = self.param(
            "LFF_bias", nn.initializers.zeros, (in_features,), jnp.float32
        )
        residual = seg_conv(segs, lff_kernel, pad=(k - 1) // 2)
        residual = residual + lff_bias.astype(cdt)
        return residual * self.residual_scaling + x


class RRDB(nn.Module):
    """Residual-in-Residual Dense Block: 3 RDBs + scaled outer residual
    (reference torch_blocks.py:293-330)."""

    growth_channels: int
    num_convs: int = 5
    lff_kern_size: int = 1
    rdb_residual_scaling: float = 0.2
    rrdb_residual_scaling: float = 0.2
    num_rdbs: int = 3
    negative_slope: float = 0.2
    init_scale: float = 1.0
    dtype: Optional[Dtype] = None
    conv_mode: str = "3D"

    @nn.compact
    def __call__(self, x):
        out = x
        for i in range(self.num_rdbs):
            out = RDB(
                growth_channels=self.growth_channels,
                num_convs=self.num_convs,
                lff_kern_size=self.lff_kern_size,
                residual_scaling=self.rdb_residual_scaling,
                negative_slope=self.negative_slope,
                init_scale=self.init_scale,
                dtype=self.dtype,
                conv_mode=self.conv_mode,
                name=f"RDB{i}",
            )(out)
        return out * self.rrdb_residual_scaling + x


class DiscriminatorBlock(nn.Module):
    """conv(+norm)+lrelu then strided conv(+norm)+lrelu.

    Stride is (2,2,2) when ``halve_z`` else (2,2,1); strided kernel is
    (4,4,feat_kern) with padding 1 (reference torch_blocks.py:372-521).
    ``drop_first_norm`` skips the norm on the first conv (block 0).
    """

    features: int
    feat_kern_size: int = 3
    norm: str = "batch"
    drop_first_norm: bool = False
    halve_z: bool = False
    negative_slope: float = 0.2
    init_scale: float = 1.0
    dtype: Optional[Dtype] = None
    conv_mode: str = "3D"

    @nn.compact
    def __call__(self, x, train: bool = True):
        pad = (self.feat_kern_size - 1) // 2
        x = ConvLReLU(
            features=self.features,
            kernel_size=self.feat_kern_size,
            strides=1,
            padding=pad,
            norm="" if self.drop_first_norm else self.norm,
            negative_slope=self.negative_slope,
            init_scale=self.init_scale,
            dtype=self.dtype,
            conv_mode=self.conv_mode,
            name="conv",
        )(x, train=train)
        stride = (2, 2, 2) if self.halve_z else (2, 2, 1)
        x = ConvLReLU(
            features=self.features,
            kernel_size=(4, 4, self.feat_kern_size),
            strides=stride,
            padding=1,
            norm=self.norm,
            negative_slope=self.negative_slope,
            init_scale=self.init_scale,
            dtype=self.dtype,
            conv_mode=self.conv_mode,
            name="strided_conv",
        )(x, train=train)
        return x
