"""Tap-stacked 3D convolution for FEW output channels.

The generator's final conv (hr_conv1: k=5³, 144→3, models/generator.py)
maps 3 output channels onto the 128-lane MXU — ~2% lane utilisation — and
measures 30 ms/step on v5e at the bench geometry, ~400× its useful FLOPs.

Reassociation (identical math): run a z-only conv whose output channels are
the STACKED (kx·ky, C_out) xy-tap partial products — N = kx·ky·C_out lanes
(75 for k=5, C_out=3: 59% of a lane tile instead of 2%) — then sum the
xy-shifted slices of that partial tensor on the VPU:

    P[x', y', (ix,iy,c)] = Σ_{iz,ci} X[x', y', z+iz-pz, ci] · K[ix,iy,iz,ci,c]
    out[x, y, c]        = Σ_{ix,iy} P[x+ix-px, y+iy-py, (ix,iy,c)]

Measured: 30 ms → ~2 ms forward. The backward is ALSO better-shaped under
plain autodiff: dW contracts to N = kx·ky·C_out and dx is a z-conv
transpose with N = C_in. Pure XLA — no Pallas needed; the shifted-slice
sums fuse.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_DN = ("NDHWC", "DHWIO", "NDHWC")


def tap_stacked_conv3d(x, kernel, padding):
    """Same result as `conv_general_dilated(x, kernel, SAME-style padding)`.

    x: (N, X, Y, Z, C_in); kernel: (kx, ky, kz, C_in, C_out);
    padding: int or (px, py, pz). Accumulates the tap sum in f32.
    """
    kx, ky, kz, cin, cout = kernel.shape
    if isinstance(padding, int):
        px = py = pz = padding
    else:
        px, py, pz = padding
    X, Y = x.shape[1], x.shape[2]

    # (kx,ky,kz,ci,co) → z-only kernel (1,1,kz,ci, kx·ky·co); flat tap index
    # t = (ix·ky + iy)·co + c (C-order of the reshape)
    kstack = jnp.transpose(kernel, (2, 3, 0, 1, 4)).reshape(
        1, 1, kz, cin, kx * ky * cout
    )
    partial = jax.lax.conv_general_dilated(
        x, kstack, window_strides=(1, 1, 1),
        padding=[(0, 0), (0, 0), (pz, pz)], dimension_numbers=_DN,
    )
    ppad = jnp.pad(
        partial, ((0, 0), (px, px), (py, py), (0, 0), (0, 0))
    )
    # z output extent follows the z conv (Z + 2·pz − kz + 1), not the input
    out = jnp.zeros(
        x.shape[:1] + (X, Y, partial.shape[3], cout), jnp.float32
    )
    for ix in range(kx):
        for iy in range(ky):
            t0 = (ix * ky + iy) * cout
            out = out + ppad[
                :, ix : ix + X, iy : iy + Y, :, t0 : t0 + cout
            ].astype(jnp.float32)
    return out.astype(x.dtype)


@functools.lru_cache(maxsize=8)
def _conv_tap_dx(padding: int):
    def base(x, w):
        return jax.lax.conv_general_dilated(
            x, w, window_strides=(1, 1, 1),
            padding=[(padding, padding)] * 3, dimension_numbers=_DN,
        )

    @jax.custom_vjp
    def f(x, w):
        return base(x, w)

    def fwd(x, w):
        return base(x, w), (x, w)

    def bwd(res, dy):
        x, w = res
        # input grad of a stride-1 SAME odd-k correlation = forward conv of
        # the cotangent with the spatially-flipped, channel-transposed
        # kernel — tap-stacked, since C_in (= the transpose's C_out) is
        # small and the default transposed conv leaves the MXU lanes idle
        wT = jnp.flip(w, (0, 1, 2)).swapaxes(3, 4)
        dx = tap_stacked_conv3d(dy, wT, padding).astype(x.dtype)
        dw = jax.linear_transpose(lambda W: base(x, W), w)(dy)[0]
        return dx, dw

    f.defvjp(fwd, bwd)
    return f


@functools.lru_cache(maxsize=8)
def _conv_split_out(padding: int, cm: int, tap_dx: bool):
    def base(x, w):
        return jax.lax.conv_general_dilated(
            x, w, window_strides=(1, 1, 1),
            padding=[(padding, padding)] * 3, dimension_numbers=_DN,
        )

    def split_fwd(x, w):
        main = base(x, w[..., :cm])
        rem = tap_stacked_conv3d(x, w[..., cm:], padding)
        return jnp.concatenate([main, rem.astype(main.dtype)], axis=-1)

    @jax.custom_vjp
    def f(x, w):
        return split_fwd(x, w)

    def fwd(x, w):
        return split_fwd(x, w), (x, w)

    def bwd(res, dy):
        # backward defaults to the plain conv's own autodiff ops (transposed
        # conv for dx, batch-spatial contraction for dw) — those are
        # full-lane already when C_in is wide; only the forward's
        # output-lane padding was the measured waste. tap_dx=True instead
        # tap-stacks the input grad (flipped-kernel forward conv) for
        # few-C_in convs like the 16-channel terrain branch, where the
        # transposed conv's C_in output lanes idle the MXU.
        x, w = res
        if tap_dx:
            wT = jnp.flip(w, (0, 1, 2)).swapaxes(3, 4)
            dx = tap_stacked_conv3d(dy, wT, padding).astype(x.dtype)
        else:
            dx = jax.linear_transpose(lambda v: base(v, w), x)(dy)[0]
        dw = jax.linear_transpose(lambda W: base(x, W), w)(dy)[0]
        return dx, dw

    f.defvjp(fwd, bwd)
    return f


def conv3d_split_out(x, kernel, padding: int, lane: int = 128,
                     tap_dx: bool = False):
    """`conv_general_dilated(x, kernel, SAME)` whose FORWARD splits the
    output channels into a full-lane-multiple main conv plus a tap-stacked
    remainder conv (ops above); identical math, fewer padded MACs.

    For the generator's hr_conv0 (128→144 k=5³, models/generator.py —
    reference Generator_3D_Resnet_ESRGAN.py:183-222): 144 output channels
    pad to 2×128 MXU lane tiles (56% utilisation) on every one of the 125
    taps. Splitting into a 128-out conv (100% lanes) + a 16-out conv whose
    25 xy-taps stack to 400 lanes (78%) costs the same FLOPs at ~1.7× fewer
    padded MACs. The custom VJP keeps the UNSPLIT conv's own backward ops,
    which are full-lane already. Falls back to the plain conv when the
    output width doesn't straddle a lane-tile boundary.
    """
    cout = kernel.shape[-1]
    cm = (cout // lane) * lane
    if cm == 0 or cm == cout or kernel.shape[0] == 1:
        if tap_dx:
            return conv3d_tap_dx(x, kernel, padding)
        return jax.lax.conv_general_dilated(
            x, kernel, window_strides=(1, 1, 1),
            padding=[(padding, padding)] * 3, dimension_numbers=_DN,
        )
    if tap_dx:
        kx, ky, kz = kernel.shape[:3]
        assert kx == ky == kz and kx % 2 == 1 and padding == (kx - 1) // 2
    return _conv_split_out(padding, cm, tap_dx)(x, kernel)


def conv3d_tap_dx(x, kernel, padding: int):
    """`conv_general_dilated(x, kernel, SAME)` whose custom VJP computes the
    INPUT gradient as a tap-stacked flipped-weight forward conv.

    For convs with FEW input channels (the generator's 16-channel terrain
    branch into hr_conv0, models/generator.py): the default input-grad is a
    transposed conv with C_in output channels — 16/128 MXU lanes — measured
    27.7 ms/G-step on v5e at the bench geometry; tap-stacking its
    kx·ky·C_in taps onto the lanes cuts it to ~5 ms. Requires stride 1 and
    symmetric padding (k−1)/2 (asserted), where the flipped-kernel identity
    is exact. Forward and weight-grad are the unchanged XLA convs.
    """
    kx, ky, kz = kernel.shape[:3]
    assert kx % 2 == 1 and padding == (kx - 1) // 2, (
        "conv3d_tap_dx requires odd k with SAME padding (k-1)/2"
    )
    assert ky == kx and kz == kx, "cubic kernels only"
    return _conv_tap_dx(padding)(x, kernel)
