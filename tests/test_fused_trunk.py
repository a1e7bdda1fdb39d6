"""Fused Pallas RRDB-trunk kernel: parity vs the flax/XLA generator.

Runs in pallas interpret mode on the CPU test mesh. The kernel re-expresses
every 3×3×3 growth conv as output-lane tap-batched matmuls with masked
row-roll scatter — these tests pin that rewrite to the reference math on
odd geometries (non-square XY, z not a tile multiple, growth channels that
don't divide 128).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gan_sr_wind_field_tpu.models import Generator3D
from gan_sr_wind_field_tpu.models.fused_apply import (
    fused_supported,
    generate_fused,
)
from gan_sr_wind_field_tpu.ops.pallas.rdb_trunk import (
    _boundary_masks_np,
    fused_rrdb_trunk,
    pack_trunk_params,
    trunk_fusable,
)


def _tiny_gen(**kw):
    defaults = dict(
        in_channels=4, out_channels=3, num_features=8, num_rrdb=2,
        upscale=4, hr_kern_size=3, num_rdb_convs=3, rdb_growth_channels=4,
        lff_kern_size=1, terrain_features=4, dropout_probability=0.1,
        init_scale=0.1, dtype=None,
    )
    defaults.update(kw)
    return Generator3D(**defaults)


def _init(G, lr_shape, hr_spatial, seed=0):
    k = jax.random.key(seed)
    lr = jax.random.normal(jax.random.fold_in(k, 1), lr_shape, jnp.float32)
    z = jax.random.normal(
        jax.random.fold_in(k, 2), (lr_shape[0],) + hr_spatial + (1,),
        jnp.float32,
    )
    params = G.init(jax.random.fold_in(k, 3), lr, z, train=False)["params"]
    return params, lr, z


def test_boundary_masks():
    X, Y, Z, w = 4, 3, 5, 2
    m = _boundary_masks_np(X, Y, Z, w)
    assert m.shape == (X * Y * Z, 4 * w)
    r = np.arange(X * Y * Z)
    ys, zs = (r // Z) % Y, r % Z
    np.testing.assert_array_equal(m[:, 0], (zs > 0).astype(np.float32))
    np.testing.assert_array_equal(m[:, w], (zs < Z - 1).astype(np.float32))
    np.testing.assert_array_equal(m[:, 2 * w], (ys > 0).astype(np.float32))
    np.testing.assert_array_equal(
        m[:, 3 * w], (ys < Y - 1).astype(np.float32)
    )


def test_trunk_kernel_matches_flax_rrdb_stack():
    """Trunk output alone vs running the flax RRDB chain on the same params."""
    G = _tiny_gen()
    lr_shape = (2, 4, 3, 5, 4)
    params, lr, z = _init(G, lr_shape, (16, 12, 5))

    feat = jax.lax.conv_general_dilated(
        lr, params["feature_conv"]["Conv_0"]["kernel"], (1, 1, 1),
        [(1, 1)] * 3, dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )

    from gan_sr_wind_field_tpu.models.blocks import RRDB

    ref = feat
    for i in range(G.num_rrdb):
        rrdb = RRDB(
            growth_channels=G.rdb_growth_channels,
            num_convs=G.num_rdb_convs,
            lff_kern_size=1,
        )
        ref = rrdb.apply({"params": params[f"RRDB{i}"]}, ref)

    packed = pack_trunk_params(
        params, G.num_rrdb, G.num_rdb_convs, G.num_features,
        G.rdb_growth_channels, jnp.float32,
    )
    got = fused_rrdb_trunk(
        packed, feat, gc=G.rdb_growth_channels, num_convs=G.num_rdb_convs,
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("split_hr", [True, False])
def test_generate_fused_matches_module_apply(split_hr):
    G = _tiny_gen(split_hr_concat=split_hr)
    lr_shape = (1, 4, 4, 5, 4)
    params, lr, z = _init(G, lr_shape, (16, 16, 5), seed=7)
    ref = G.apply({"params": params}, lr, z, train=False)
    got = generate_fused(G, params, lr, z, interpret=True)
    assert got.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_generate_fused_bf16_close_to_module():
    G = _tiny_gen(dtype=jnp.bfloat16)
    lr_shape = (1, 4, 4, 5, 4)
    params, lr, z = _init(G, lr_shape, (16, 16, 5), seed=3)
    ref = G.apply({"params": params}, lr, z, train=False)
    got = generate_fused(G, params, lr, z, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0.05, atol=0.05)


def test_generate_fused_five_conv_rdb_and_16x():
    """Reference default geometry (5 convs/RDB) and a 16x upscale chain."""
    G = _tiny_gen(num_rdb_convs=5, upscale=16, num_rrdb=1)
    lr_shape = (1, 2, 2, 5, 4)
    params, lr, z = _init(G, lr_shape, (32, 32, 5), seed=11)
    ref = G.apply({"params": params}, lr, z, train=False)
    got = generate_fused(G, params, lr, z, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_trunk_fusable_gates():
    assert trunk_fusable(5, 32, 1, "3D", (16, 16, 10))
    assert not trunk_fusable(5, 32, 3, "3D", (16, 16, 10))  # lff kern 3
    assert not trunk_fusable(5, 32, 1, "horizontal_3D", (16, 16, 10))
    assert not trunk_fusable(5, 32, 1, "3D", (64, 64, 10))  # too many rows
    assert not trunk_fusable(5, 32, 1, "3D", (3, 3, 3))  # rows % 8
    G = _tiny_gen()
    assert fused_supported(G, (1, 4, 4, 4, 4))
    assert not fused_supported(G, (1, 3, 3, 3, 4))


# ---------------------------------------------------------- trainer wiring
def test_train_step_with_fused_trunk_matches_xla():
    """4 steps (2 G, 2 D) with/without the fused trunk: identical metrics.

    The D branch's no-grad G forward is the only site that switches backend;
    in float32 the kernel matches XLA to float tolerance, so the whole
    training trajectory must coincide.
    """
    from test_train_step import make_batch, tiny_cfg
    from gan_sr_wind_field_tpu.train.gan import WindFieldGAN

    rng = np.random.default_rng(0)
    x = np.arange(16, dtype=np.float32) * 150
    lr, hr, z = make_batch(rng)
    runs = []
    for fused in (False, True):
        cfg = tiny_cfg()
        cfg.use_fused_trunk = fused
        gan = WindFieldGAN(cfg, x, x)
        if fused:
            assert gan.use_fused_trunk
        state = gan.init_state(
            jax.random.key(0), (2, 4, 4, 4, 4), (2, 16, 16, 4, 3)
        )
        ms = []
        for _ in range(4):
            state, m = gan.train_step(state, lr, hr, z)
            ms.append({k: float(v) for k, v in m.items()})
        runs.append(ms)
    for step_ref, step_fused in zip(*runs):
        for k in step_ref:
            np.testing.assert_allclose(
                step_ref[k], step_fused[k], rtol=1e-4, atol=1e-6,
                err_msg=k,
            )


def test_generate_uses_fused_path_and_matches():
    from test_train_step import make_batch, tiny_cfg
    from gan_sr_wind_field_tpu.train.gan import WindFieldGAN

    rng = np.random.default_rng(1)
    x = np.arange(16, dtype=np.float32) * 150
    lr, hr, z = make_batch(rng)
    cfg = tiny_cfg()
    cfg.use_fused_trunk = True
    gan = WindFieldGAN(cfg, x, x)
    state = gan.init_state(
        jax.random.key(0), (2, 4, 4, 4, 4), (2, 16, 16, 4, 3)
    )
    sr_fused = gan.generate(state.params_G, lr, z)
    sr_ref = gan.G.apply({"params": state.params_G}, lr, z, train=False)
    np.testing.assert_allclose(
        np.asarray(sr_fused), np.asarray(sr_ref), rtol=1e-5, atol=1e-5
    )
