"""Pallas TPU kernel: fused 9-channel wind-field gradient.

One VMEM-resident pass computes ∂(u,v,w)/∂x, ∂y, ∂z for a whole sample —
the pure-XLA path (ops/physics.py) materialises the shifted operand slices
and the three gradient tensors through HBM.

Layout is chosen for the TPU tile model: the (N, X, Y, Zl, 3) field is
transposed host-side to ``(N, Zl·C, X, Y)`` so that
- Y rides the 128-lane axis (64 → one half-tile, no 42× channel padding),
- X rides the 8-sublane axis → x-shifts are native sublane slices,
- z-shifts are leading-dim row shifts by C (untiled axis, free),
and the per-axis nonuniform-difference coefficients arrive as
broadcast-ready (1, X, 1)/(1, 1, Y) blocks (no lane↔sublane reshapes
in-kernel — Mosaic layout rule).

The nonuniform central difference is the 3-term form
f'ᵢ = Aᵢ·f_{i+1} + Bᵢ·fᵢ + Cᵢ·f_{i-1} with clamped edge neighbours; edge
rows fold the one-sided difference into A/B. z coefficients are per-voxel
(terrain-following grid), computed in-kernel from the height block.

Numerics match ops/physics.py (tested in interpret mode and on device).
Used for forward/metric paths; training keeps the XLA implementation whose
VJP is free.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


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


def _shift(f, axis, up: bool):
    """Neighbour along ``axis`` with clamped edges."""
    n = f.shape[axis]
    if up:  # f_{i+1}
        body = jax.lax.slice_in_dim(f, 1, n, axis=axis)
        edge = jax.lax.slice_in_dim(f, n - 1, n, axis=axis)
        return jnp.concatenate([body, edge], axis=axis)
    body = jax.lax.slice_in_dim(f, 0, n - 1, axis=axis)
    edge = jax.lax.slice_in_dim(f, 0, 1, axis=axis)
    return jnp.concatenate([edge, body], axis=axis)


def _shift_z(f, c: int, up: bool):
    """z-neighbour in the (Zl·C, X, Y) layout: row shift by C, clamped."""
    n = f.shape[0]
    if up:
        return jnp.concatenate([f[c:], f[n - c :]], axis=0)
    return jnp.concatenate([f[:c], f[: n - c]], axis=0)


def _grad_kernel(c: int, f_ref, z_ref, ax_ref, bx_ref, cx_ref, ay_ref,
                 by_ref, cy_ref, out_ref):
    f = f_ref[0]  # (Zl*C, X, Y) f32
    zg = z_ref[0]  # (Zl, X, Y)

    ax, bx, cx = ax_ref[...], bx_ref[...], cx_ref[...]  # (1, X, 1)
    gx = ax * _shift(f, 1, True) + bx * f + cx * _shift(f, 1, False)

    ay, by, cy = ay_ref[...], by_ref[...], cy_ref[...]  # (1, 1, Y)
    gy = ay * _shift(f, 2, True) + by * f + cy * _shift(f, 2, False)

    # per-voxel z coefficients from the terrain-following grid
    dz = zg[1:] - zg[:-1]  # (Zl-1, X, Y)
    d_lo, d_hi = dz[:-1], dz[1:]
    denom = d_lo * d_hi * (d_lo + d_hi)
    a_in = d_lo**2 / denom
    b_in = (d_hi**2 - d_lo**2) / denom
    c_in = -(d_hi**2) / denom
    zeros1 = jnp.zeros_like(dz[:1])
    inv_bot, inv_top = 1.0 / dz[:1], 1.0 / dz[-1:]
    az = jnp.concatenate([inv_bot, a_in, zeros1], axis=0)  # (Zl, X, Y)
    bz = jnp.concatenate([-inv_bot, b_in, inv_top], axis=0)
    cz = jnp.concatenate([zeros1, c_in, -inv_top], axis=0)
    # replicate per wind component: flatten order is (z major, c minor)
    az, bz, cz = (jnp.repeat(v, c, axis=0) for v in (az, bz, cz))
    gz = az * _shift_z(f, c, True) + bz * f + cz * _shift_z(f, c, False)

    out_ref[0] = jnp.concatenate([gx, gy, gz], axis=0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def wind_field_gradient_pallas(uvw, x, y, Z, interpret: bool = False):
    """Fused equivalent of ops.physics.wind_field_gradient.

    uvw: (N, X, Y, Zl, 3); x: (X,); y: (Y,); Z: (N, X, Y, Zl, 1).
    Returns (N, X, Y, Zl, 9) float32, channels [∂/∂x, ∂/∂y, ∂/∂z]×(u,v,w).
    """
    uvw = uvw.astype(jnp.float32)
    n, X, Y, Zl, C = uvw.shape
    # (N, X, Y, Zl, C) → (N, Zl·C, X, Y)
    f = jnp.transpose(uvw, (0, 3, 4, 1, 2)).reshape(n, Zl * C, X, Y)
    zg = jnp.transpose(Z.astype(jnp.float32)[..., 0], (0, 3, 1, 2))

    ax, bx, cx = _axis_coeffs(jnp.asarray(x))
    ay, by, cy = _axis_coeffs(jnp.asarray(y))
    ax, bx, cx = (v[None, :, None] for v in (ax, bx, cx))
    ay, by, cy = (v[None, None, :] for v in (ay, by, cy))

    vec = lambda v: pl.BlockSpec(v.shape, lambda i: (0, 0, 0))
    out = pl.pallas_call(
        functools.partial(_grad_kernel, C),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, Zl * C, X, Y), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, Zl, X, Y), lambda i: (i, 0, 0, 0)),
            vec(ax), vec(bx), vec(cx), vec(ay), vec(by), vec(cy),
        ],
        out_specs=pl.BlockSpec((1, 3 * Zl * C, X, Y), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, 3 * Zl * C, X, Y), jnp.float32),
        interpret=interpret,
    )(f, zg, ax, bx, cx, ay, by, cy)

    # (N, 3, Zl, C, X, Y) → (N, X, Y, Zl, 3·C)
    out = out.reshape(n, 3, Zl, C, X, Y)
    out = jnp.transpose(out, (0, 4, 5, 2, 1, 3)).reshape(n, X, Y, Zl, 3 * C)
    return out


# --------------------------------------------------------------- custom VJP
def _shift0(f, axis, up: bool):
    """Neighbour along ``axis`` with ZERO (not clamped) edges."""
    n = f.shape[axis]
    zeros = jnp.zeros_like(jax.lax.slice_in_dim(f, 0, 1, axis=axis))
    if up:
        body = jax.lax.slice_in_dim(f, 1, n, axis=axis)
        return jnp.concatenate([body, zeros], axis=axis)
    body = jax.lax.slice_in_dim(f, 0, n - 1, axis=axis)
    return jnp.concatenate([zeros, body], axis=axis)


def _shift0_z(f, c: int, up: bool):
    n = f.shape[0]
    zeros = jnp.zeros_like(f[:c])
    if up:
        return jnp.concatenate([f[c:], zeros], axis=0)
    return jnp.concatenate([zeros, f[: n - c]], axis=0)


def _grad_transpose_kernel(c: int, g_ref, z_ref, ax_ref, bx_ref, cx_ref,
                           ay_ref, by_ref, cy_ref, out_ref):
    """Adjoint of `_grad_kernel` w.r.t. the wind field.

    The forward is the linear 3-term stencil with zeroed out-of-range
    coefficients (A_{n-1}=0, C_0=0), so the clamped-edge terms have zero
    weight and the exact transpose is simply
        (Lᵀg)_j = A_{j-1}·g_{j-1} + B_j·g_j + C_{j+1}·g_{j+1}
    i.e. zero-padded shifts of (A·g), (B·g), (C·g).
    """
    g = g_ref[0]  # (3·Zl·C, X, Y): [gx; gy; gz]
    zg = z_ref[0]
    m = g.shape[0] // 3
    gx, gy, gz = g[:m], g[m : 2 * m], g[2 * m :]

    ax, bx, cx = ax_ref[...], bx_ref[...], cx_ref[...]
    d = _shift0(ax * gx, 1, False) + bx * gx + _shift0(cx * gx, 1, True)

    ay, by, cy = ay_ref[...], by_ref[...], cy_ref[...]
    d += _shift0(ay * gy, 2, False) + by * gy + _shift0(cy * gy, 2, True)

    dz = zg[1:] - zg[:-1]
    d_lo, d_hi = dz[:-1], dz[1:]
    denom = d_lo * d_hi * (d_lo + d_hi)
    a_in = d_lo**2 / denom
    b_in = (d_hi**2 - d_lo**2) / denom
    c_in = -(d_hi**2) / denom
    zeros1 = jnp.zeros_like(dz[:1])
    inv_bot, inv_top = 1.0 / dz[:1], 1.0 / dz[-1:]
    az = jnp.concatenate([inv_bot, a_in, zeros1], axis=0)
    bz = jnp.concatenate([-inv_bot, b_in, inv_top], axis=0)
    cz = jnp.concatenate([zeros1, c_in, -inv_top], axis=0)
    az, bz, cz = (jnp.repeat(v, c, axis=0) for v in (az, bz, cz))
    d += _shift0_z(az * gz, c, False) + bz * gz + _shift0_z(cz * gz, c, True)

    out_ref[0] = d


@functools.partial(jax.jit, static_argnames=("interpret",))
def _gradient_transpose_pallas(g9, x, y, Z, interpret: bool = False):
    """d(uvw) for cotangent g9 (N, X, Y, Zl, 9). Adjoint of the forward."""
    g9 = g9.astype(jnp.float32)
    n, X, Y, Zl, C9 = g9.shape
    C = C9 // 3
    g = jnp.transpose(
        g9.reshape(n, X, Y, Zl, 3, C), (0, 4, 3, 5, 1, 2)
    ).reshape(n, 3 * Zl * C, X, Y)
    zg = jnp.transpose(Z.astype(jnp.float32)[..., 0], (0, 3, 1, 2))

    ax, bx, cx = _axis_coeffs(jnp.asarray(x))
    ay, by, cy = _axis_coeffs(jnp.asarray(y))
    ax, bx, cx = (v[None, :, None] for v in (ax, bx, cx))
    ay, by, cy = (v[None, None, :] for v in (ay, by, cy))

    vec = lambda v: pl.BlockSpec(v.shape, lambda i: (0, 0, 0))
    out = pl.pallas_call(
        functools.partial(_grad_transpose_kernel, C),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, 3 * Zl * C, X, Y), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, Zl, X, Y), lambda i: (i, 0, 0, 0)),
            vec(ax), vec(bx), vec(cx), vec(ay), vec(by), vec(cy),
        ],
        out_specs=pl.BlockSpec((1, Zl * C, X, Y), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, Zl * C, X, Y), jnp.float32),
        interpret=interpret,
    )(g, zg, ax, bx, cx, ay, by, cy)

    out = out.reshape(n, Zl, C, X, Y)
    return jnp.transpose(out, (0, 3, 4, 1, 2))


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def wind_field_gradient_fused(uvw, x, y, Z, interpret: bool = False):
    """Differentiable fused stencil (Pallas fwd + Pallas transpose bwd).

    NOTE: cotangents for x, y, and Z are ZERO — the grid geometry is data,
    never a trainable quantity (the reference likewise treats Z as a detached
    input, wind_field_GAN_3D.py:381-386). Do not differentiate w.r.t. them.
    """
    return wind_field_gradient_pallas(uvw, x, y, Z, interpret=interpret)


def _fused_fwd(uvw, x, y, Z, interpret):
    out = wind_field_gradient_pallas(uvw, x, y, Z, interpret=interpret)
    return out, (x, y, Z)


def _fused_bwd(interpret, res, g9):
    x, y, Z = res
    d_uvw = _gradient_transpose_pallas(g9, x, y, Z, interpret=interpret)
    return (d_uvw, jnp.zeros_like(x), jnp.zeros_like(y), jnp.zeros_like(Z))


wind_field_gradient_fused.defvjp(_fused_fwd, _fused_bwd)
