"""Resampling ops for channel-last (N, X, Y, Z, C) volumes.

- ``upsample_trilinear_xy``: the trilinear-interpolation baseline. The
  reference uses ``nn.functional.interpolate(..., scale_factor=(s,s,1),
  mode='trilinear', align_corners=True)`` (wind_field_GAN_3D.py:745-770,
  test.py:138-143). `jax.image.resize` has half-pixel semantics, so we
  implement align_corners=True by hand: out index i samples source position
  ``i * (in-1) / (out-1)``. With z-scale 1 and align_corners the z axis is an
  exact identity, so only x and y are interpolated.
- ``upsample_nearest_xy``: PyTorch ``nn.Upsample(mode='nearest')`` with
  scale (2,2,1) == element repetition (torch_blocks.py:333-369).
- ``decimate_xy``: the reference's LR construction — pure strided decimation,
  deliberately NOT an anti-aliased downsample (process_data.py:451-457).
"""

from __future__ import annotations

import jax.numpy as jnp


def _linear_resize_axis_align_corners(x: jnp.ndarray, out_size: int, axis: int):
    """1D linear resize with align_corners=True along ``axis``."""
    in_size = x.shape[axis]
    if out_size == in_size:
        return x
    x = jnp.moveaxis(x, axis, -1)
    if in_size == 1:
        out = jnp.repeat(x, out_size, axis=-1)
        return jnp.moveaxis(out, -1, axis)
    pos = jnp.arange(out_size, dtype=jnp.float32) * (in_size - 1) / (out_size - 1)
    lo = jnp.floor(pos).astype(jnp.int32)
    lo = jnp.clip(lo, 0, in_size - 2)
    w = (pos - lo.astype(jnp.float32)).astype(x.dtype)
    x_lo = jnp.take(x, lo, axis=-1)
    x_hi = jnp.take(x, lo + 1, axis=-1)
    out = x_lo * (1.0 - w) + x_hi * w
    return jnp.moveaxis(out, -1, axis)


def upsample_trilinear_xy(lr: jnp.ndarray, scale: int) -> jnp.ndarray:
    """Trilinear align_corners=True upsample of (N, X, Y, Z, C) over x,y only."""
    out = _linear_resize_axis_align_corners(lr, lr.shape[1] * scale, axis=1)
    out = _linear_resize_axis_align_corners(out, lr.shape[2] * scale, axis=2)
    return out


def upsample_nearest_xy(x: jnp.ndarray, scale: int = 2) -> jnp.ndarray:
    """Nearest-neighbour upsample over x,y of (N, X, Y, Z, C)."""
    x = jnp.repeat(x, scale, axis=1)
    x = jnp.repeat(x, scale, axis=2)
    return x


def decimate_xy(hr: jnp.ndarray, factor: int) -> jnp.ndarray:
    """Strided decimation ``hr[:, ::f, ::f]`` — the reference LR operator."""
    return hr[:, ::factor, ::factor]
