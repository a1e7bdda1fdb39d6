"""horizontal_3D conv-mode tests.

Oracle: when every per-window kernel is identical, HorizontalConv3D must
equal a shared-weight 3D convolution with the same padding/stride — the
unshared-weights generalisation collapses to the shared case.

(The reference's horizontal generator actually crashes at init — the
horizontal branch defines `terrain_conv` but `terrain_convs` is consumed,
Generator_3D_Resnet_ESRGAN.py:172-222 — we implement the mode working.)
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gan_sr_wind_field_tpu.models import Discriminator3D, Generator3D
from gan_sr_wind_field_tpu.models.blocks import HorizontalConv3D


class TestHorizontalConv:
    @pytest.mark.parametrize("kz,pz,sz", [(3, 1, 1), (3, 1, 2), (1, 0, 1)])
    def test_collapses_to_shared_conv_when_weights_tied(self, rng, kz, pz, sz):
        n, X, Y, Z, cin, cout = 2, 8, 8, 6, 3, 5
        x = jnp.asarray(rng.standard_normal((n, X, Y, Z, cin)), jnp.float32)
        mod = HorizontalConv3D(
            features=cout, kernel_size=(3, 3, kz), strides=(1, 1, sz),
            padding=(1, 1, pz),
        )
        variables = mod.init(jax.random.key(0), x)
        k = variables["params"]["kernel"]  # (W, kh, kw, kz, cin, cout)
        tied = jnp.broadcast_to(k[0:1], k.shape)
        out = mod.apply({"params": {"kernel": tied}}, x)

        ref = jax.lax.conv_general_dilated(
            x, k[0], window_strides=(1, 1, sz),
            padding=[(1, 1), (1, 1), (pz, pz)],
            dimension_numbers=("NHWDC", "HWDIO", "NHWDC"),
        )
        assert out.shape == ref.shape
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5
        )

    def test_param_count_matches_reference_convention(self):
        # reference: one Conv3d(in,out,k,bias=False) per window,
        # W = (z - k + 2p)//s + 1 (torch_blocks.py:123-146)
        z, k, p, s, cin, cout = 10, 3, 1, 1, 4, 8
        mod = HorizontalConv3D(features=cout, kernel_size=k,
                               padding=(1, 1, p), strides=(1, 1, s))
        x = jnp.zeros((1, 8, 8, z, cin))
        shapes = jax.eval_shape(lambda key: mod.init(key, x), jax.random.key(0))
        total = sum(int(np.prod(v.shape)) for v in
                    jax.tree.leaves(shapes["params"]))
        W = (z - k + 2 * p) // s + 1
        assert total == W * k * k * k * cin * cout

    def test_unshared_weights_differ_across_height(self, rng):
        x = jnp.asarray(rng.standard_normal((1, 6, 6, 4, 2)), jnp.float32)
        mod = HorizontalConv3D(features=3, kernel_size=3, padding=(1, 1, 1))
        variables = mod.init(jax.random.key(1), x)
        out = mod.apply(variables, x)
        # constant input along z should still give different outputs per
        # layer (weights unshared)
        xc = jnp.broadcast_to(x[:, :, :, :1], x.shape)
        outc = mod.apply(variables, xc)
        assert not np.allclose(np.asarray(outc[0, 3, 3, 0]),
                               np.asarray(outc[0, 3, 3, 2]))


class TestHorizontalModels:
    def test_generator_forward(self):
        g = Generator3D(
            in_channels=4, num_features=8, num_rrdb=1, num_rdb_convs=2,
            rdb_growth_channels=4, upscale=4, hr_kern_size=3,
            terrain_features=4, conv_mode="horizontal_3D",
        )
        lr = jnp.zeros((1, 4, 4, 6, 4))
        zt = jnp.zeros((1, 16, 16, 6, 1))
        variables = g.init(jax.random.key(0), lr, zt, train=False)
        out = g.apply(variables, lr, zt, train=False)
        assert out.shape == (1, 16, 16, 6, 3)

    def test_discriminator_forward(self):
        d = Discriminator3D(
            base_features=4, enable_slicing=True, number_of_z_layers=10,
            conv_mode="horizontal_3D",
        )
        x = jnp.zeros((2, 64, 64, 10, 3))
        variables = d.init(jax.random.key(0), x, train=False)
        out = d.apply(variables, x, train=False)
        assert out.shape == (2,)
