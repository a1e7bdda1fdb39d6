"""Tap-stacked conv parity: the reassociated few-output-channel conv must
match `lax.conv_general_dilated` in values and gradients, and the generator
must produce identical fields with the flag on/off."""

import numpy as np

import jax
import jax.numpy as jnp

from gan_sr_wind_field_tpu.ops.tap_conv import tap_stacked_conv3d

_DN = ("NDHWC", "DHWIO", "NDHWC")


def _direct(x, k, pad):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1, 1), [(pad, pad)] * 3, dimension_numbers=_DN
    )


def test_value_parity_f32(rng):
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 6, 16)), jnp.float32)
    k = jnp.asarray(
        rng.standard_normal((5, 5, 5, 16, 3)) * 0.1, jnp.float32
    )
    got = tap_stacked_conv3d(x, k, 2)
    ref = _direct(x, k, 2)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5
    )


def test_value_parity_k3_rect(rng):
    x = jnp.asarray(rng.standard_normal((1, 7, 9, 4, 8)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, 3, 8, 2)), jnp.float32)
    got = tap_stacked_conv3d(x, k, 1)
    ref = _direct(x, k, 1)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5
    )


def test_grad_parity(rng):
    x = jnp.asarray(rng.standard_normal((1, 6, 6, 4, 8)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, 3, 8, 3)) * 0.1, jnp.float32)
    ct = jnp.asarray(rng.standard_normal((1, 6, 6, 4, 3)), jnp.float32)

    def loss(fn, xx, kk):
        return jnp.sum(fn(xx, kk) * ct)

    gx_a, gk_a = jax.grad(
        lambda xx, kk: loss(lambda a, b: tap_stacked_conv3d(a, b, 1), xx, kk),
        argnums=(0, 1),
    )(x, k)
    gx_b, gk_b = jax.grad(
        lambda xx, kk: loss(lambda a, b: _direct(a, b, 1), xx, kk),
        argnums=(0, 1),
    )(x, k)
    np.testing.assert_allclose(np.asarray(gx_a), np.asarray(gx_b),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gk_a), np.asarray(gk_b),
                               rtol=1e-4, atol=1e-5)


def test_conv3d_tap_dx_value_and_grads(rng):
    """conv3d_tap_dx: forward and BOTH grads match autodiff of the direct
    conv (its custom VJP tap-stacks only the input grad)."""
    from gan_sr_wind_field_tpu.ops.tap_conv import conv3d_tap_dx

    x = jnp.asarray(rng.standard_normal((2, 6, 6, 5, 4)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((5, 5, 5, 4, 8)) * 0.1, jnp.float32)
    ct = jnp.asarray(rng.standard_normal((2, 6, 6, 5, 8)), jnp.float32)

    np.testing.assert_allclose(
        np.asarray(conv3d_tap_dx(x, k, 2)), np.asarray(_direct(x, k, 2)),
        rtol=1e-5, atol=1e-5,
    )

    def loss(fn, xx, kk):
        return jnp.sum(fn(xx, kk) * ct)

    gx_a, gk_a = jax.grad(
        lambda xx, kk: loss(lambda a, b: conv3d_tap_dx(a, b, 2), xx, kk),
        argnums=(0, 1),
    )(x, k)
    gx_b, gk_b = jax.grad(
        lambda xx, kk: loss(lambda a, b: _direct(a, b, 2), xx, kk),
        argnums=(0, 1),
    )(x, k)
    np.testing.assert_allclose(np.asarray(gx_a), np.asarray(gx_b),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gk_a), np.asarray(gk_b),
                               rtol=1e-4, atol=1e-4)


def test_generator_flag_parity(rng):
    """Same params → same output with tap_stacked_hr on/off (f32)."""
    from gan_sr_wind_field_tpu.models import Generator3D

    kw = dict(
        in_channels=4, out_channels=3, num_features=8, num_rrdb=1,
        upscale=4, hr_kern_size=3, num_rdb_convs=2, rdb_growth_channels=4,
        terrain_features=4, dropout_probability=0.0, remat=False,
    )
    g_on = Generator3D(**kw, tap_stacked_hr=True)
    g_off = Generator3D(**kw, tap_stacked_hr=False)
    lr = jnp.asarray(rng.standard_normal((1, 4, 4, 4, 4)), jnp.float32)
    zt = jnp.asarray(rng.standard_normal((1, 16, 16, 4, 1)), jnp.float32)
    params = g_on.init(jax.random.key(0), lr, zt, train=False)["params"]
    # identical param trees (TapStackedConv mirrors nn.Conv param layout)
    params_off = g_off.init(jax.random.key(0), lr, zt, train=False)["params"]
    assert jax.tree_util.tree_structure(params) == \
        jax.tree_util.tree_structure(params_off)
    a = g_on.apply({"params": params}, lr, zt, train=False)
    b = g_off.apply({"params": params}, lr, zt, train=False)
    np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
    )


def test_conv3d_split_out_value_and_grads(rng):
    """conv3d_split_out: forward (split main + tap-stacked remainder) and
    both grads match the direct conv. lane=4 so cout=6 straddles a tile."""
    from gan_sr_wind_field_tpu.ops.tap_conv import conv3d_split_out

    x = jnp.asarray(rng.standard_normal((2, 6, 6, 5, 5)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, 3, 5, 6)) * 0.1, jnp.float32)
    ct = jnp.asarray(rng.standard_normal((2, 6, 6, 5, 6)), jnp.float32)

    np.testing.assert_allclose(
        np.asarray(conv3d_split_out(x, k, 1, lane=4)),
        np.asarray(_direct(x, k, 1)), rtol=1e-5, atol=1e-5,
    )

    def loss(fn, xx, kk):
        return jnp.sum(fn(xx, kk) * ct)

    gx_a, gk_a = jax.grad(
        lambda xx, kk: loss(
            lambda a, b: conv3d_split_out(a, b, 1, lane=4), xx, kk
        ),
        argnums=(0, 1),
    )(x, k)
    gx_b, gk_b = jax.grad(
        lambda xx, kk: loss(lambda a, b: _direct(a, b, 1), xx, kk),
        argnums=(0, 1),
    )(x, k)
    np.testing.assert_allclose(np.asarray(gx_a), np.asarray(gx_b),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gk_a), np.asarray(gk_b),
                               rtol=1e-4, atol=1e-4)


def test_conv3d_split_out_fallback(rng):
    """cout below/at one lane tile falls back to the plain conv."""
    from gan_sr_wind_field_tpu.ops.tap_conv import conv3d_split_out

    x = jnp.asarray(rng.standard_normal((1, 5, 5, 4, 3)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, 3, 3, 4)), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(conv3d_split_out(x, k, 1, lane=8)),
        np.asarray(_direct(x, k, 1)), rtol=1e-6, atol=1e-6,
    )


def test_generator_split_hr_out_parity(rng):
    """split_hr_out on/off: identical param trees and outputs at the real
    head width (128 trunk + 16 terrain = 144 straddles the 128 lane)."""
    from gan_sr_wind_field_tpu.models import Generator3D

    kw = dict(
        in_channels=4, out_channels=3, num_features=128, num_rrdb=1,
        upscale=4, hr_kern_size=3, num_rdb_convs=2, rdb_growth_channels=4,
        terrain_features=16, dropout_probability=0.0, remat=False,
    )
    g_on = Generator3D(**kw, split_hr_out=True)
    g_off = Generator3D(**kw, split_hr_out=False)
    lr = jnp.asarray(rng.standard_normal((1, 3, 3, 4, 4)), jnp.float32)
    zt = jnp.asarray(rng.standard_normal((1, 12, 12, 4, 1)), jnp.float32)
    params = g_on.init(jax.random.key(0), lr, zt, train=False)["params"]
    params_off = g_off.init(jax.random.key(0), lr, zt, train=False)["params"]
    assert jax.tree_util.tree_structure(params) == \
        jax.tree_util.tree_structure(params_off)
    assert params["hr_conv0_x"]["kernel"].shape == (3, 3, 3, 128, 144)
    a = g_on.apply({"params": params}, lr, zt, train=False)
    b = g_off.apply({"params": params}, lr, zt, train=False)
    np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5
    )


def test_conv3d_split_out_tap_dx(rng):
    """split-out forward + tap-stacked input grad (the terrain-conv combo):
    value and both grads match the direct conv."""
    from gan_sr_wind_field_tpu.ops.tap_conv import conv3d_split_out

    x = jnp.asarray(rng.standard_normal((1, 6, 6, 5, 3)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, 3, 3, 7)) * 0.1, jnp.float32)
    ct = jnp.asarray(rng.standard_normal((1, 6, 6, 5, 7)), jnp.float32)

    np.testing.assert_allclose(
        np.asarray(conv3d_split_out(x, k, 1, lane=4, tap_dx=True)),
        np.asarray(_direct(x, k, 1)), rtol=1e-5, atol=1e-5,
    )

    def loss(fn, xx, kk):
        return jnp.sum(fn(xx, kk) * ct)

    gx_a, gk_a = jax.grad(
        lambda xx, kk: loss(
            lambda a, b: conv3d_split_out(a, b, 1, lane=4, tap_dx=True),
            xx, kk,
        ),
        argnums=(0, 1),
    )(x, k)
    gx_b, gk_b = jax.grad(
        lambda xx, kk: loss(lambda a, b: _direct(a, b, 1), xx, kk),
        argnums=(0, 1),
    )(x, k)
    np.testing.assert_allclose(np.asarray(gx_a), np.asarray(gx_b),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gk_a), np.asarray(gk_b),
                               rtol=1e-4, atol=1e-4)


def test_generator_forward_split_halves_parity(rng):
    """The concat-free split-halves head in generator_forward (the no-grad
    perf path) matches the unsplit head exactly — same stub trunk, same
    params, train=False and train=True (same dropout key/mask draw)."""
    from gan_sr_wind_field_tpu.models import Generator3D
    from gan_sr_wind_field_tpu.models.fused_apply import generator_forward

    kw = dict(
        in_channels=4, out_channels=3, num_features=128, num_rrdb=1,
        upscale=4, hr_kern_size=3, num_rdb_convs=2, rdb_growth_channels=4,
        terrain_features=16, dropout_probability=0.3, remat=False,
    )
    g_on = Generator3D(**kw, split_hr_out=True)
    g_off = Generator3D(**kw, split_hr_out=False)
    lr = jnp.asarray(rng.standard_normal((2, 3, 3, 4, 4)), jnp.float32)
    zt = jnp.asarray(rng.standard_normal((2, 12, 12, 4, 1)), jnp.float32)
    params = g_on.init(jax.random.key(0), lr, zt, train=False)["params"]

    def trunk_fn(v):
        return v * 0.9 + 0.05  # deterministic stand-in for the RRDB trunk

    a = generator_forward(g_on, params, lr, zt, trunk_fn, train=False)
    b = generator_forward(g_off, params, lr, zt, trunk_fn, train=False)
    np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5
    )

    key = jax.random.key(7)
    a = generator_forward(
        g_on, params, lr, zt, trunk_fn, train=True, dropout_key=key
    )
    b = generator_forward(
        g_off, params, lr, zt, trunk_fn, train=True, dropout_key=key
    )
    np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5
    )


def test_conv3d_split_out_sharded_parity(rng):
    """conv3d_split_out under GSPMD (batch-sharded jit on the virtual mesh)
    matches the single-device result — the no-grad D branch runs it on
    data-parallel meshes via the _G_nograd flax fallback."""
    import jax.numpy as jnp_  # noqa: F401
    from jax.sharding import NamedSharding, PartitionSpec as P

    from gan_sr_wind_field_tpu.ops.tap_conv import conv3d_split_out
    from gan_sr_wind_field_tpu.parallel import make_mesh

    mesh = make_mesh(4, 1)
    x = jnp.asarray(rng.standard_normal((4, 6, 6, 5, 5)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, 3, 5, 6)) * 0.1, jnp.float32)

    ref = conv3d_split_out(x, k, 1, lane=4)
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))
    ks = jax.device_put(k, NamedSharding(mesh, P()))
    got = jax.jit(lambda a, b: conv3d_split_out(a, b, 1, lane=4))(xs, ks)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-6
    )
