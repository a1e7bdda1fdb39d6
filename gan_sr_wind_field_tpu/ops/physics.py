"""Physics-informed differential operators on nonuniform 3D grids.

Pure `jax.numpy`, channel-last layout ``(N, X, Y, Z, C)`` (TPU-native: C rides
the 128-wide lane dimension; the reference keeps channels first, which XLA
would have to transpose on TPU).

Semantics match the reference bit-for-bit-ish:
- horizontal gradients = second-order nonuniform central differences with
  one-sided first-order boundaries, i.e. ``torch.gradient(HR, dim=(2,3),
  spacing=(x,y))`` (reference process_data.py:301-313),
- vertical gradient = dZ²-weighted nonuniform stencil with one-sided
  boundaries (reference ``calculate_div_z``, process_data.py:273-298),
- loss normalisation factors ``max(HR_max, SR_max/100)`` (reference
  wind_field_GAN_3D.py:773-814). Note the z-gradient factor uses a signed max
  (no abs) — a reference quirk we preserve.

All functions are jit-safe (static shapes, no Python control flow on traced
values) and differentiable.
"""

from __future__ import annotations

import jax.numpy as jnp


def _nonuniform_gradient_1d(f: jnp.ndarray, coords: jnp.ndarray, axis: int):
    """Second-order nonuniform central difference along ``axis``.

    ``coords`` is the 1D physical coordinate array for that axis. Interior
    points use the h²-weighted three-point stencil; boundaries use one-sided
    first-order differences (torch.gradient / numpy.gradient edge_order=1).
    """
    n = f.shape[axis]
    if n < 2:
        raise ValueError("gradient needs at least 2 points")
    f = jnp.moveaxis(f, axis, -1)  # (..., n)

    h = coords[1:] - coords[:-1]  # (n-1,)
    hs = h[:-1]  # h_{i-1}, left spacing of interior point i
    hd = h[1:]  # h_i, right spacing

    f_prev = f[..., :-2]
    f_mid = f[..., 1:-1]
    f_next = f[..., 2:]
    interior = (
        hs**2 * f_next + (hd**2 - hs**2) * f_mid - hd**2 * f_prev
    ) / (hs * hd * (hs + hd))

    left = (f[..., 1:2] - f[..., 0:1]) / h[0]
    right = (f[..., -1:] - f[..., -2:-1]) / h[-1]

    out = jnp.concatenate([left, interior, right], axis=-1)
    return jnp.moveaxis(out, -1, axis)


def gradient_xy(field: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray):
    """∂field/∂x and ∂field/∂y for ``field`` of shape (N, X, Y, Z, C).

    ``x`` (X,) and ``y`` (Y,) are physical coordinates (possibly nonuniform).
    Matches ``torch.gradient(HR, dim=(2,3), spacing=(x,y))`` on the
    channel-first reference layout (process_data.py:303).
    """
    grad_x = _nonuniform_gradient_1d(field, x, axis=1)
    grad_y = _nonuniform_gradient_1d(field, y, axis=2)
    return grad_x, grad_y


def gradient_z_nonuniform(field: jnp.ndarray, Z: jnp.ndarray):
    """∂field/∂z on a terrain-following (per-column nonuniform) z grid.

    ``field``: (N, X, Y, Zl, C); ``Z``: (N, X, Y, Zl, 1) geopotential height.
    Interior: dZ²-weighted second-order stencil; boundaries: one-sided.
    Mirrors reference ``calculate_div_z`` (process_data.py:273-298) exactly,
    including its formulation of the interior weights.
    """
    dZ = Z[:, :, :, 1:, :] - Z[:, :, :, :-1, :]  # (N,X,Y,Zl-1,1), broadcasts over C

    d_lo = dZ[:, :, :, :-1, :]  # spacing below point i
    d_hi = dZ[:, :, :, 1:, :]  # spacing above point i

    f_prev = field[:, :, :, :-2, :]
    f_mid = field[:, :, :, 1:-1, :]
    f_next = field[:, :, :, 2:, :]

    interior = (
        d_lo**2 * f_next + (d_hi**2 - d_lo**2) * f_mid - d_hi**2 * f_prev
    ) / (d_lo * d_hi * (d_lo + d_hi))

    bottom = (field[:, :, :, 1:2, :] - field[:, :, :, 0:1, :]) / dZ[:, :, :, 0:1, :]
    top = (field[:, :, :, -1:, :] - field[:, :, :, -2:-1, :]) / dZ[:, :, :, -1:, :]

    return jnp.concatenate([bottom, interior, top], axis=3)


def wind_field_gradient(
    uvw: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray, Z: jnp.ndarray
) -> jnp.ndarray:
    """9-channel wind gradient [∂(u,v,w)/∂x, ∂(u,v,w)/∂y, ∂(u,v,w)/∂z].

    ``uvw``: (N, X, Y, Zl, 3). Channel order matches the reference concat
    (process_data.py:301-313): divergence = ch0 + ch4 + ch8.
    Computed in float32 regardless of input dtype (stencils are
    cancellation-sensitive; bf16 would destroy the divergence signal).
    """
    uvw = uvw.astype(jnp.float32)
    grad_x, grad_y = gradient_xy(uvw, x, y)
    grad_z = gradient_z_nonuniform(uvw, Z.astype(jnp.float32))
    return jnp.concatenate([grad_x, grad_y, grad_z], axis=-1)


def divergence_3d(grad9: jnp.ndarray) -> jnp.ndarray:
    """∇·u from a 9-channel gradient tensor: ch0 + ch4 + ch8."""
    return grad9[..., 0] + grad9[..., 4] + grad9[..., 8]


def divergence_xy(grad9: jnp.ndarray) -> jnp.ndarray:
    """Horizontal divergence: ch0 + ch4."""
    return grad9[..., 0] + grad9[..., 4]


def gradient_norm_factors(HR_grad: jnp.ndarray, SR_grad: jnp.ndarray):
    """Normalisation factors for the four physics losses.

    Returns (max_xy_gradient, max_z_gradient, max_divergence,
    max_xy_divergence), each = max(HR_max, SR_max / 100)
    (reference wind_field_GAN_3D.py:773-814). The z-gradient factor is a
    signed max — preserved reference quirk.
    """
    max_hr_xy = jnp.max(jnp.abs(HR_grad[..., :6]))
    max_sr_xy = jnp.max(jnp.abs(SR_grad[..., :6]))

    max_hr_z = jnp.max(HR_grad[..., 6:])
    max_sr_z = jnp.max(SR_grad[..., 6:])

    max_hr_div = jnp.max(jnp.abs(divergence_3d(HR_grad)))
    max_sr_div = jnp.max(jnp.abs(divergence_3d(SR_grad)))

    max_hr_xy_div = jnp.max(jnp.abs(divergence_xy(HR_grad)))
    max_sr_xy_div = jnp.max(jnp.abs(divergence_xy(SR_grad)))

    return (
        jnp.maximum(max_hr_xy, max_sr_xy / 100.0),
        jnp.maximum(max_hr_z, max_sr_z / 100.0),
        jnp.maximum(max_hr_div, max_sr_div / 100.0),
        jnp.maximum(max_hr_xy_div, max_sr_xy_div / 100.0),
    )
