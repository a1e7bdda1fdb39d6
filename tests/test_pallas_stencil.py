"""Pallas fused stencil vs the pure-XLA physics path (interpret mode on the
CPU test mesh; the same kernel compiles on TPU)."""

import numpy as np

import jax.numpy as jnp

from gan_sr_wind_field_tpu.ops.pallas.stencil import wind_field_gradient_pallas
from gan_sr_wind_field_tpu.ops.physics import wind_field_gradient


def _case(rng, n=2, X=16, Y=16, Zl=8):
    uvw = rng.standard_normal((n, X, Y, Zl, 3)).astype(np.float32)
    x = np.cumsum(0.5 + rng.random(X)).astype(np.float32) * 100
    y = np.cumsum(0.5 + rng.random(Y)).astype(np.float32) * 100
    Z = (np.cumsum(1.0 + rng.random((n, X, Y, Zl)), axis=-1) * 10).astype(
        np.float32
    )[..., None]
    return uvw, x, y, Z


def test_matches_xla_path(rng):
    uvw, x, y, Z = _case(rng)
    ref = np.asarray(
        wind_field_gradient(jnp.asarray(uvw), jnp.asarray(x), jnp.asarray(y),
                            jnp.asarray(Z))
    )
    got = np.asarray(
        wind_field_gradient_pallas(
            jnp.asarray(uvw), jnp.asarray(x), jnp.asarray(y), jnp.asarray(Z),
            interpret=True,
        )
    )
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_uniform_grid_linear_field_exact(rng):
    n, X, Y, Zl = 1, 8, 8, 6
    x = np.arange(X, dtype=np.float32) * 10
    y = np.arange(Y, dtype=np.float32) * 10
    zcols = np.broadcast_to(
        np.arange(Zl, dtype=np.float32) * 5, (n, X, Y, Zl)
    ).copy()
    uvw = np.stack(
        [2 * x[None, :, None, None] + np.zeros((n, X, Y, Zl)),
         3 * y[None, None, :, None] + np.zeros((n, X, Y, Zl)),
         4 * zcols],
        axis=-1,
    ).astype(np.float32)
    got = np.asarray(
        wind_field_gradient_pallas(
            jnp.asarray(uvw), jnp.asarray(x), jnp.asarray(y),
            jnp.asarray(zcols[..., None]), interpret=True,
        )
    )
    np.testing.assert_allclose(got[..., 0], 2.0, atol=1e-4)  # du/dx
    np.testing.assert_allclose(got[..., 4], 3.0, atol=1e-4)  # dv/dy
    np.testing.assert_allclose(got[..., 8], 4.0, atol=1e-4)  # dw/dz


def test_custom_vjp_matches_xla_grad(rng):
    from gan_sr_wind_field_tpu.ops.pallas.stencil import (
        wind_field_gradient_fused,
    )
    import jax

    uvw, x, y, Z = _case(rng, n=1, X=8, Y=8, Zl=6)
    uvw_j, x_j, y_j, Z_j = map(jnp.asarray, (uvw, x, y, Z))
    w = jnp.asarray(rng.standard_normal((1, 8, 8, 6, 9)), jnp.float32)

    def loss_ref(f):
        return jnp.sum(wind_field_gradient(f, x_j, y_j, Z_j) * w)

    def loss_pal(f):
        return jnp.sum(wind_field_gradient_fused(f, x_j, y_j, Z_j, True) * w)

    g_ref = jax.grad(loss_ref)(uvw_j)
    g_pal = jax.grad(loss_pal)(uvw_j)
    np.testing.assert_allclose(
        np.asarray(g_pal), np.asarray(g_ref), rtol=1e-4, atol=1e-5
    )
