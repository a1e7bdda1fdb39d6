"""Pallas TPU kernel: fused 9-channel wind-field gradient.

One VMEM-resident pass computes ∂(u,v,w)/∂x, ∂y, ∂z for a whole sample —
the pure-XLA path (ops/physics.py) materialises the shifted operand slices
and the three gradient tensors through HBM. A 64×64×10×3 f32 sample plus its
z grid and the 9-channel output is ~2.2 MB, comfortably inside one core's
VMEM, so the kernel grids over the batch only.

The nonuniform central difference is expressed as a per-position 3-term
form  f'ᵢ = Aᵢ·f_{i+1} + Bᵢ·fᵢ + Cᵢ·f_{i-1}  with clamped edge neighbours;
the (A, B, C) coefficient vectors for the x/y axes are precomputed host-side
from the physical coordinates (boundary rows fold the one-sided difference
into A/B with C=0, and symmetrically at the top). The z coefficients are
per-voxel (terrain-following grid) and are computed inside the kernel from
the geopotential height block.

Numerics match ops/physics.py bit-for-bit-ish (same f32 formulas, tested in
interpret mode and on device). Used for the forward/metric paths; training
keeps the XLA implementation because its VJP is free.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _axis_coeffs(coords: jnp.ndarray):
    """(A, B, C) vectors for one axis of physical coordinates (length n).

    Interior i: the h²-weighted nonuniform central difference
    (ops/physics.py `_nonuniform_gradient_1d`); edges: one-sided first-order
    with the out-of-range term zeroed (neighbours are clamped in-kernel).
    """
    coords = coords.astype(jnp.float32)
    h = coords[1:] - coords[:-1]
    hs, hd = h[:-1], h[1:]
    denom = hs * hd * (hs + hd)
    a_int = hs**2 / denom
    b_int = (hd**2 - hs**2) / denom
    c_int = -(hd**2) / denom

    A = jnp.concatenate([jnp.array([1.0 / h[0]]), a_int, jnp.array([0.0])])
    B = jnp.concatenate(
        [jnp.array([-1.0 / h[0]]), b_int, jnp.array([1.0 / h[-1]])]
    )
    C = jnp.concatenate([jnp.array([0.0]), c_int, jnp.array([-1.0 / h[-1]])])
    return A, B, C


def _shift_up(f, axis):
    """f_{i+1} with clamped top edge."""
    n = f.shape[axis]
    upper = jax.lax.slice_in_dim(f, 1, n, axis=axis)
    last = jax.lax.slice_in_dim(f, n - 1, n, axis=axis)
    return jnp.concatenate([upper, last], axis=axis)


def _shift_dn(f, axis):
    """f_{i-1} with clamped bottom edge."""
    n = f.shape[axis]
    lower = jax.lax.slice_in_dim(f, 0, n - 1, axis=axis)
    first = jax.lax.slice_in_dim(f, 0, 1, axis=axis)
    return jnp.concatenate([first, lower], axis=axis)


def _grad_kernel(uvw_ref, z_ref, ax_ref, bx_ref, cx_ref, ay_ref, by_ref,
                 cy_ref, out_ref):
    f = uvw_ref[0]  # (X, Y, Zl, 3) f32
    zg = z_ref[0]  # (X, Y, Zl, 1)

    # ---- x gradient: coefficients broadcast along (Y, Zl, C)
    ax = ax_ref[0][:, None, None, None]
    bx = bx_ref[0][:, None, None, None]
    cx = cx_ref[0][:, None, None, None]
    gx = ax * _shift_up(f, 0) + bx * f + cx * _shift_dn(f, 0)

    ay = ay_ref[0][None, :, None, None]
    by = by_ref[0][None, :, None, None]
    cy = cy_ref[0][None, :, None, None]
    gy = ay * _shift_up(f, 1) + by * f + cy * _shift_dn(f, 1)

    # ---- z gradient: per-voxel coefficients from the terrain-following grid
    dz = zg[:, :, 1:, :] - zg[:, :, :-1, :]  # (X, Y, Zl-1, 1)
    d_lo, d_hi = dz[:, :, :-1, :], dz[:, :, 1:, :]
    denom = d_lo * d_hi * (d_lo + d_hi)
    a_in = d_lo**2 / denom
    b_in = (d_hi**2 - d_lo**2) / denom
    c_in = -(d_hi**2) / denom

    zeros1 = jnp.zeros_like(dz[:, :, :1, :])
    inv_bot = 1.0 / dz[:, :, :1, :]
    inv_top = 1.0 / dz[:, :, -1:, :]
    az = jnp.concatenate([inv_bot, a_in, zeros1], axis=2)
    bz = jnp.concatenate([-inv_bot, b_in, inv_top], axis=2)
    cz = jnp.concatenate([zeros1, c_in, -inv_top], axis=2)
    gz = az * _shift_up(f, 2) + bz * f + cz * _shift_dn(f, 2)

    out_ref[0] = jnp.concatenate([gx, gy, gz], axis=-1)


@functools.partial(jax.jit, static_argnames=("interpret",))
def wind_field_gradient_pallas(uvw, x, y, Z, interpret: bool = False):
    """Fused equivalent of ops.physics.wind_field_gradient.

    uvw: (N, X, Y, Zl, 3); x: (X,); y: (Y,); Z: (N, X, Y, Zl, 1).
    Returns (N, X, Y, Zl, 9) float32.
    """
    uvw = uvw.astype(jnp.float32)
    Z = Z.astype(jnp.float32)
    n, X, Y, Zl, C = uvw.shape
    ax, bx, cx = _axis_coeffs(jnp.asarray(x))
    ay, by, cy = _axis_coeffs(jnp.asarray(y))
    # 2D (1, n) VMEM blocks — 1D ANY-space refs are not loadable on TPU
    ax, bx, cx, ay, by, cy = (v[None, :] for v in (ax, bx, cx, ay, by, cy))

    vec = lambda v: pl.BlockSpec((1, v.shape[1]), lambda i: (0, 0))
    return pl.pallas_call(
        _grad_kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, X, Y, Zl, C), lambda i: (i, 0, 0, 0, 0)),
            pl.BlockSpec((1, X, Y, Zl, 1), lambda i: (i, 0, 0, 0, 0)),
            vec(ax), vec(bx), vec(cx), vec(ay), vec(by), vec(cy),
        ],
        out_specs=pl.BlockSpec((1, X, Y, Zl, 3 * C), lambda i: (i, 0, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, X, Y, Zl, 3 * C), jnp.float32),
        interpret=interpret,
    )(uvw, Z, ax, bx, cx, ay, by, cy)
