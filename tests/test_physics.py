"""Physics-op parity tests.

Oracle strategy (SURVEY.md §4): torch's public API (torch.gradient,
F.interpolate) provides the exact semantics the reference relied on; analytic
fields check the math independently.
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from gan_sr_wind_field_tpu.ops.physics import (
    divergence_3d,
    gradient_norm_factors,
    gradient_xy,
    gradient_z_nonuniform,
    wind_field_gradient,
)
from gan_sr_wind_field_tpu.ops.metrics import psnr
from gan_sr_wind_field_tpu.ops.resize import (
    decimate_xy,
    upsample_nearest_xy,
    upsample_trilinear_xy,
)



def _rand_field(rng, n=2, x=12, y=10, z=8, c=3):
    return rng.standard_normal((n, x, y, z, c)).astype(np.float32)


def _rand_coords(rng, n):
    # strictly increasing, nonuniform
    return np.cumsum(0.5 + rng.random(n)).astype(np.float32) * 100.0


class TestGradientXY:
    def test_matches_torch_gradient_nonuniform(self, rng):
        f = _rand_field(rng)
        x = _rand_coords(rng, f.shape[1])
        y = _rand_coords(rng, f.shape[2])

        gx, gy = gradient_xy(jnp.asarray(f), jnp.asarray(x), jnp.asarray(y))

        # torch oracle on channel-first layout (reference layout)
        tf = torch.from_numpy(np.moveaxis(f, -1, 1).copy())  # (N,C,X,Y,Z)
        tgx, tgy = torch.gradient(
            tf, dim=(2, 3), spacing=(torch.from_numpy(x), torch.from_numpy(y))
        )
        np.testing.assert_allclose(
            np.asarray(gx), np.moveaxis(tgx.numpy(), 1, -1), rtol=2e-4, atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(gy), np.moveaxis(tgy.numpy(), 1, -1), rtol=2e-4, atol=1e-6
        )

    def test_exact_on_quadratic(self, rng):
        # second-order stencil is exact for quadratics on interior points
        x = _rand_coords(rng, 16)
        f = (x**2)[None, :, None, None, None] * np.ones((1, 16, 4, 3, 1), np.float32)
        gx, _ = gradient_xy(
            jnp.asarray(f), jnp.asarray(x), jnp.asarray(np.arange(4.0, dtype=np.float32))
        )
        expected = 2.0 * x
        np.testing.assert_allclose(
            np.asarray(gx)[0, 1:-1, 0, 0, 0], expected[1:-1], rtol=1e-4
        )


class TestGradientZ:
    def test_matches_independent_stencil(self, rng):
        f = _rand_field(rng)
        n, X, Y, Zl, C = f.shape
        # per-column nonuniform z grid (terrain-following)
        zcols = np.cumsum(0.5 + rng.random((n, X, Y, Zl)), axis=-1).astype(np.float32)
        Z = zcols[..., None]

        got = np.asarray(gradient_z_nonuniform(jnp.asarray(f), jnp.asarray(Z)))

        # independent numpy oracle: the standard 3-point nonuniform FD stencil
        expected = np.zeros_like(f)
        dz = zcols[..., 1:] - zcols[..., :-1]
        for k in range(1, Zl - 1):
            a = dz[..., k - 1][..., None]
            b = dz[..., k][..., None]
            expected[:, :, :, k] = (
                a**2 * f[:, :, :, k + 1]
                + (b**2 - a**2) * f[:, :, :, k]
                - b**2 * f[:, :, :, k - 1]
            ) / (a * b * (a + b))
        expected[:, :, :, 0] = (f[:, :, :, 1] - f[:, :, :, 0]) / dz[..., 0][..., None]
        expected[:, :, :, -1] = (f[:, :, :, -1] - f[:, :, :, -2]) / dz[..., -1][
            ..., None
        ]
        np.testing.assert_allclose(got, expected, rtol=2e-4, atol=1e-6)

    def test_exact_on_linear_field(self, rng):
        n, X, Y, Zl = 1, 4, 4, 9
        zcols = np.cumsum(0.5 + rng.random((n, X, Y, Zl)), axis=-1).astype(np.float32)
        f = (3.0 * zcols)[..., None]  # f = 3z -> df/dz = 3 everywhere
        got = np.asarray(
            gradient_z_nonuniform(jnp.asarray(f), jnp.asarray(zcols[..., None]))
        )
        np.testing.assert_allclose(got, 3.0, rtol=1e-4)


class TestWindFieldGradient:
    def test_channel_order_and_divergence_free(self, rng):
        # analytic divergence-free field: u=f(y), v=g(z), w=h(x)
        X, Y, Zl = 16, 16, 8
        x = np.linspace(0.0, 150.0, X).astype(np.float32)
        y = np.linspace(0.0, 150.0, Y).astype(np.float32)
        z1 = np.linspace(10.0, 80.0, Zl).astype(np.float32)
        Z = np.broadcast_to(z1, (1, X, Y, Zl))[..., None].astype(np.float32)

        xx = x[None, :, None, None]
        yy = y[None, None, :, None]
        zz = np.broadcast_to(z1, (1, X, Y, Zl))
        u = np.sin(yy / 40.0) * np.ones((1, X, Y, Zl), np.float32)
        v = np.cos(zz / 30.0)
        w = (xx / 100.0) ** 2 * np.ones((1, X, Y, Zl), np.float32)
        uvw = np.stack([u, v, w], axis=-1).astype(np.float32)

        grad9 = wind_field_gradient(
            jnp.asarray(uvw), jnp.asarray(x), jnp.asarray(y), jnp.asarray(Z)
        )
        assert grad9.shape == (1, X, Y, Zl, 9)
        div = np.asarray(divergence_3d(grad9))
        # du/dx = 0, dv/dy = 0, dw/dz = 0 analytically
        assert np.max(np.abs(div)) < 1e-4

    def test_result_is_float32_even_for_bf16_input(self, rng):
        f = jnp.asarray(_rand_field(rng), dtype=jnp.bfloat16)
        x = jnp.asarray(_rand_coords(rng, f.shape[1]))
        y = jnp.asarray(_rand_coords(rng, f.shape[2]))
        Z = jnp.cumsum(
            jnp.ones((f.shape[0], f.shape[1], f.shape[2], f.shape[3], 1)), axis=3
        )
        out = wind_field_gradient(f, x, y, Z)
        assert out.dtype == jnp.float32


class TestNormFactors:
    def test_max_semantics(self, rng):
        hr = jnp.asarray(rng.standard_normal((1, 4, 4, 4, 9)).astype(np.float32))
        sr = hr * 250.0  # SR much larger so SR/100 wins
        fs = gradient_norm_factors(hr, sr)
        np.testing.assert_allclose(
            float(fs[0]), float(jnp.max(jnp.abs(hr[..., :6]))) * 2.5, rtol=1e-5
        )
        # z-factor is a signed max (reference quirk, wind_field_GAN_3D.py:780-781)
        np.testing.assert_allclose(
            float(fs[1]), float(jnp.max(hr[..., 6:])) * 2.5, rtol=1e-5
        )


class TestPSNR:
    def test_reference_formula(self, rng):
        hr = _rand_field(rng, n=2, x=8, y=8, z=4, c=3)
        sr = hr + 0.05 * rng.standard_normal(hr.shape).astype(np.float32)
        got = float(psnr(jnp.asarray(hr), jnp.asarray(sr)))
        mse = np.sum((hr - sr) ** 2) / (8 * 8 * 4 * 2)  # no channel divisor!
        expected = 10.0 * np.log10(4.0 / (mse + 1e-8))
        np.testing.assert_allclose(got, expected, rtol=1e-5)

    def test_identical_fields_cap(self):
        hr = jnp.ones((1, 4, 4, 4, 3))
        assert float(psnr(hr, hr)) > 80.0  # 10*log10(4/1e-8) ≈ 86 dB


class TestResize:
    @pytest.mark.parametrize("scale", [2, 4])
    def test_trilinear_matches_torch_align_corners(self, rng, scale):
        lr = _rand_field(rng, n=2, x=8, y=8, z=5, c=3)
        got = np.asarray(upsample_trilinear_xy(jnp.asarray(lr), scale))
        t = torch.from_numpy(np.moveaxis(lr, -1, 1).copy())
        ref = torch.nn.functional.interpolate(
            t, scale_factor=(scale, scale, 1), mode="trilinear", align_corners=True
        )
        np.testing.assert_allclose(
            got, np.moveaxis(ref.numpy(), 1, -1), rtol=1e-4, atol=1e-5
        )

    def test_nearest_matches_torch(self, rng):
        x = _rand_field(rng, n=1, x=4, y=4, z=3, c=2)
        got = np.asarray(upsample_nearest_xy(jnp.asarray(x), 2))
        t = torch.from_numpy(np.moveaxis(x, -1, 1).copy())
        ref = torch.nn.Upsample(scale_factor=(2, 2, 1), mode="nearest")(t)
        np.testing.assert_allclose(got, np.moveaxis(ref.numpy(), 1, -1))

    def test_decimate(self, rng):
        hr = _rand_field(rng, n=1, x=16, y=16, z=4, c=3)
        lr = np.asarray(decimate_xy(jnp.asarray(hr), 4))
        np.testing.assert_allclose(lr, hr[:, ::4, ::4])


# core inner-loop tier: `pytest -m smoke` (VERDICT r4 next 8)
pytestmark = pytest.mark.smoke
