"""Cross-layer property: the equivariant augmentation must preserve the
physics. A divergence-free wind field stays divergence-free under rot90 with
(u,v) rotation and under mirror flips with component negation — this is WHY
the reference negates/permutes components (process_data.py:198-262); plain
spatial rot/flip would break it."""

import numpy as np

import jax.numpy as jnp

from gan_sr_wind_field_tpu.data.augment import (
    flip_vector_field_np,
    rot90_vector_field_np,
)
from gan_sr_wind_field_tpu.ops.physics import divergence_3d, wind_field_gradient


def _div_free_field(n=24, zl=8):
    # u = dψ/dy, v = -dψ/dx of streamfunction ψ = sin(x/a)cos(y/a):
    # analytically divergence-free with BOTH components varying in both
    # coordinates (so naive rot/flip genuinely breaks it); w = 0
    h = 50.0
    a = 300.0
    x = np.arange(n) * h
    xx, yy = np.meshgrid(x, x, indexing="ij")
    u = (-np.sin(xx / a) * np.sin(yy / a) / a)[..., None] * np.ones((1, 1, zl))
    v = (-np.cos(xx / a) * np.cos(yy / a) / a)[..., None] * np.ones((1, 1, zl))
    w = np.zeros((n, n, zl))
    uvw = np.stack([u, v, w], axis=-1).astype(np.float32)
    z = np.broadcast_to(np.arange(zl) * 12.0, (n, n, zl)).astype(np.float32)
    return uvw, x.astype(np.float32), z[..., None]


def _max_abs_div(uvw, x, z):
    grad9 = wind_field_gradient(
        jnp.asarray(uvw[None]), jnp.asarray(x), jnp.asarray(x),
        jnp.asarray(z[None]),
    )
    return float(jnp.max(jnp.abs(divergence_3d(grad9))))


def test_rotation_preserves_divergence_free():
    uvw, x, z = _div_free_field()
    base = _max_abs_div(uvw, x, z)  # discretisation floor ≈ 9e-7
    assert base < 2e-6
    for k in (1, 2, 3):
        rot = rot90_vector_field_np(uvw, k)
        zr = np.rot90(z, k, axes=(0, 1)).copy()
        assert _max_abs_div(rot, x, zr) < 2e-6, k
    # sanity: rotating WITHOUT the component rotation breaks it (k=2 is
    # excluded: a 180° rotation without negation flips both derivative
    # signs, so divergence-free survives trivially)
    for k in (1, 3):
        naive = np.rot90(uvw, k, axes=(0, 1)).copy()
        zr = np.rot90(z, k, axes=(0, 1)).copy()
        assert _max_abs_div(naive, x, zr) > 1e-5, k


def test_flip_preserves_divergence_free():
    uvw, x, z = _div_free_field()
    for axis in (0, 1):
        flipped = flip_vector_field_np(uvw, axis)
        zf = np.flip(z, axis=axis).copy()
        assert _max_abs_div(flipped, x, zf) < 2e-6, axis
        naive = np.flip(uvw, axis=axis).copy()
        assert _max_abs_div(naive, x, zf) > 1e-5, axis
