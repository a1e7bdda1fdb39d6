"""The all-J feature-grouped dW formulation equals the per-step scan math.

`models/fused_train._dw_allj` replaces the J-step dW scan with one grouped
conv per (residual, cotangent) pair (VERDICT r4 weak 4 A/B). Oracle: the
exact per-step `jax.linear_transpose` convs the scan body runs.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gan_sr_wind_field_tpu.models.fused_train import _conv, _dw_allj

J, N, X, Y, ZL, NF, GCT = 6, 2, 4, 4, 3, 8, 8



def _scan_oracle(states, growths, dU, dLFF):
    w_s = jax.ShapeDtypeStruct((3, 3, 3, NF, GCT), jnp.float32)
    w_g = jax.ShapeDtypeStruct((3, 3, 3, GCT, GCT), jnp.float32)
    wl_s = jax.ShapeDtypeStruct((1, 1, 1, NF, NF), jnp.float32)
    wl_g = jax.ShapeDtypeStruct((1, 1, 1, GCT, NF), jnp.float32)
    dWall, dWl, dbl = [], [], []
    for j in range(J):
        s, g, du, dlff = states[j], growths[j], dU[j], dLFF[j]
        dWall.append(jnp.concatenate([
            jax.linear_transpose(lambda w: _conv(s, w, 1), w_s)(du)[0],
            jax.linear_transpose(lambda w: _conv(g, w, 1), w_g)(du)[0],
        ], axis=3))
        dWl.append(jnp.concatenate([
            jax.linear_transpose(lambda w: _conv(s, w, 0), wl_s)(dlff)[0],
            jax.linear_transpose(lambda w: _conv(g, w, 0), wl_g)(dlff)[0],
        ], axis=3))
        dbl.append(jnp.sum(dlff, axis=(0, 1, 2, 3)))
    return (jnp.stack(dWall), jnp.stack(dWl), jnp.stack(dbl))


def test_dw_allj_matches_scan_math(rng):
    shp = (J, N, X, Y, ZL)
    states = jnp.asarray(rng.standard_normal(shp + (NF,)), jnp.float32)
    growths = jnp.asarray(rng.standard_normal(shp + (GCT,)), jnp.float32)
    dU = jnp.asarray(rng.standard_normal(shp + (GCT,)), jnp.float32)
    dLFF = jnp.asarray(rng.standard_normal(shp + (NF,)), jnp.float32)

    got = _dw_allj(states, growths, dU, dLFF, J=J, nf=NF, gcT=GCT)
    want = _scan_oracle(states, growths, dU, dLFF)
    for g, w, name in zip(got, want, ("dWall", "dWl", "dbl")):
        assert g.shape == w.shape, name
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), rtol=2e-5, atol=2e-5, err_msg=name
        )


# core inner-loop tier: `pytest -m smoke` (VERDICT r4 next 8)
pytestmark = pytest.mark.smoke
