"""Model parity tests: parameter counts vs the reference torch models
(calibrated once against CNN_models/Generator_3D_Resnet_ESRGAN.py and
Discriminator_3D.py with the shipped local-config hyperparameters), forward
shapes, and dtype policy.

Param counts use `jax.eval_shape` (shape-only tracing, no FLOPs) so the full
34M-param models stay cheap on the CPU test mesh; behavioural tests use small
models.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gan_sr_wind_field_tpu.models import Discriminator3D, Generator3D

# Reference totals measured from the torch models (local-config hparams:
# nf=128, 16 RRDB, gc=32, 5 convs, hr_kern=5, lff_kern=1, tnf=16, in_ch=4;
# D: base 32, feat_kern 3, z=10).
REF_G_PARAMS_4X = 34_769_571
REF_G_PARAMS_8X = 35_211_939
REF_D_PARAMS_SLICING = 10_931_753
REF_D_PARAMS_FULL = 12_308_009



def count_params(tree):
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(tree))


def _small_g(**kw):
    defaults = dict(
        in_channels=4,
        out_channels=3,
        num_features=16,
        num_rrdb=1,
        upscale=4,
        hr_kern_size=3,
        num_rdb_convs=3,
        rdb_growth_channels=8,
        lff_kern_size=1,
        terrain_features=4,
        dropout_probability=0.1,
    )
    defaults.update(kw)
    return Generator3D(**defaults)


class TestGenerator:
    @pytest.mark.parametrize(
        "upscale,expected", [(4, REF_G_PARAMS_4X), (8, REF_G_PARAMS_8X)]
    )
    def test_param_count_matches_reference(self, upscale, expected):
        g = Generator3D(
            in_channels=4,
            out_channels=3,
            num_features=128,
            num_rrdb=16,
            upscale=upscale,
            hr_kern_size=5,
            num_rdb_convs=5,
            rdb_growth_channels=32,
            lff_kern_size=1,
            terrain_features=16,
            dropout_probability=0.1,
        )
        lr = jnp.zeros((1, 4, 4, 10, 4))
        z = jnp.zeros((1, 4 * upscale, 4 * upscale, 10, 1))
        shapes = jax.eval_shape(
            lambda k: g.init(k, lr, z, train=False), jax.random.key(0)
        )
        assert count_params(shapes["params"]) == expected

    def test_forward_shape(self):
        g = _small_g()
        lr = jnp.zeros((2, 8, 8, 10, 4))
        z = jnp.zeros((2, 32, 32, 10, 1))
        variables = g.init(jax.random.key(0), lr, z, train=False)
        out = g.apply(variables, lr, z, train=False)
        assert out.shape == (2, 32, 32, 10, 3)
        assert out.dtype == jnp.float32

    def test_upscale8_shape(self):
        g = _small_g(upscale=8)
        lr = jnp.zeros((1, 4, 4, 10, 4))
        z = jnp.zeros((1, 32, 32, 10, 1))
        variables = g.init(jax.random.key(0), lr, z, train=False)
        assert g.apply(variables, lr, z, train=False).shape == (1, 32, 32, 10, 3)

    def test_bf16_compute(self):
        g = _small_g(dtype=jnp.bfloat16)
        lr = jnp.ones((1, 8, 8, 4, 4))
        z = jnp.ones((1, 32, 32, 4, 1))
        variables = g.init(jax.random.key(0), lr, z, train=False)
        assert all(
            p.dtype == jnp.float32 for p in jax.tree.leaves(variables["params"])
        )
        out = g.apply(variables, lr, z, train=False)
        assert out.dtype == jnp.float32
        assert np.all(np.isfinite(np.asarray(out)))

    def test_dropout_rng(self):
        g = _small_g(dropout_probability=0.5)
        lr = jnp.ones((1, 8, 8, 4, 4))
        z = jnp.ones((1, 32, 32, 4, 1))
        variables = g.init(jax.random.key(0), lr, z, train=False)
        o1 = g.apply(variables, lr, z, train=True, rng_key=jax.random.key(1))
        o2 = g.apply(variables, lr, z, train=True, rng_key=jax.random.key(2))
        o_eval = g.apply(variables, lr, z, train=False)
        o_eval2 = g.apply(variables, lr, z, train=False)
        assert not np.allclose(np.asarray(o1), np.asarray(o2))
        np.testing.assert_array_equal(np.asarray(o_eval), np.asarray(o_eval2))


class TestDiscriminator:
    @pytest.mark.parametrize(
        "slicing,size,expected",
        [(True, 64, REF_D_PARAMS_SLICING), (False, 128, REF_D_PARAMS_FULL)],
    )
    def test_param_count_matches_reference(self, slicing, size, expected):
        d = Discriminator3D(
            in_channels=3,
            base_features=32,
            enable_slicing=slicing,
            number_of_z_layers=10,
        )
        x = jnp.zeros((1, size, size, 10, 3))
        shapes = jax.eval_shape(
            lambda k: d.init(k, x, train=False), jax.random.key(0)
        )
        assert count_params(shapes["params"]) == expected

    @pytest.mark.parametrize("slicing,size", [(True, 64), (False, 128)])
    def test_forward_logit_shape(self, slicing, size):
        d = Discriminator3D(
            base_features=4, enable_slicing=slicing, number_of_z_layers=10
        )
        x = jnp.zeros((3, size, size, 10, 3))
        variables = d.init(jax.random.key(0), x, train=False)
        out, mutated = d.apply(
            variables,
            x,
            train=True,
            mutable=["batch_stats"],
            rng_key=jax.random.key(1),
        )
        assert out.shape == (3,)
        assert "batch_stats" in mutated

    def test_features_only(self):
        d = Discriminator3D(
            base_features=4, enable_slicing=True, number_of_z_layers=10
        )
        x = jnp.zeros((1, 64, 64, 10, 3))
        variables = d.init(jax.random.key(0), x, train=False)
        feats = d.apply(variables, x, train=False, features_only=True)
        # 64 -> /16 horizontal, z 10 -> 5 after the (1,1,2) head conv
        assert feats.shape == (1, 4, 4, 5, 4 * 8)


def test_upscale16_shape():
    g = _small_g(upscale=16)
    lr = jnp.zeros((1, 2, 2, 10, 4))
    z = jnp.zeros((1, 32, 32, 10, 1))
    variables = g.init(jax.random.key(0), lr, z, train=False)
    assert g.apply(variables, lr, z, train=False).shape == (1, 32, 32, 10, 3)


def test_non_power_of_two_scale_rounds_down():
    # reference rounds 6x down to 4x with a warning (Generator:201-206)
    g = _small_g(upscale=6)
    lr = jnp.zeros((1, 4, 4, 4, 4))
    z = jnp.zeros((1, 16, 16, 4, 1))
    variables = g.init(jax.random.key(0), lr, z, train=False)
    assert g.apply(variables, lr, z, train=False).shape == (1, 16, 16, 4, 3)


# core inner-loop tier: `pytest -m smoke` (VERDICT r4 next 8)
pytestmark = pytest.mark.smoke
