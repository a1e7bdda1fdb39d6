"""Mesh-parallel tests on the 8-device virtual CPU mesh: DP batch sharding,
TP channel sharding, full train step under both, and cross-replica
consistency with the single-device result."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from gan_sr_wind_field_tpu.parallel import (
    batch_sharding,
    make_mesh,
    shard_params,
    shard_state,
)
from test_train_step import make_batch, tiny_cfg

from gan_sr_wind_field_tpu.train.gan import WindFieldGAN


@pytest.fixture(scope="module")
def gan():
    cfg = tiny_cfg()
    cfg.generator.num_features = 16  # divisible by tp=2
    x = np.arange(16, dtype=np.float32) * 150
    return WindFieldGAN(cfg, x, x)


def test_mesh_shapes():
    mesh = make_mesh(4, 2)
    assert dict(mesh.shape) == {"data": 4, "model": 2}
    mesh = make_mesh(-1, 2)
    assert mesh.shape["data"] == 4


def test_param_sharding_rules(gan):
    mesh = make_mesh(4, 2)
    state = gan.init_state(jax.random.key(0), (4, 4, 4, 4, 4), (4, 16, 16, 4, 3))
    params = shard_params(state.params_G, mesh)
    # a conv kernel should be sharded on its output-channel dim
    leaf = params["feature_conv"]["Conv_0"]["kernel"]
    spec = leaf.sharding.spec
    assert spec == P(None, None, None, None, "model")


def test_dp_train_step_matches_single_device(gan, rng):
    """The sharded step must compute the same math as the unsharded one."""
    mesh = make_mesh(8, 1)
    lr, hr, z = make_batch(rng, n=8)
    state0 = gan.init_state(jax.random.key(0), (8, 4, 4, 4, 4), (8, 16, 16, 4, 3))

    s_single = jax.tree.map(jnp.copy, state0)
    s_single, m_single = gan.train_step(s_single, lr, hr, z)

    ds = batch_sharding(mesh)
    s_shard = shard_state(jax.tree.map(jnp.copy, state0), mesh)
    lr_s, hr_s, z_s = (jax.device_put(a, ds) for a in (lr, hr, z))
    s_shard, m_shard = gan.train_step(s_shard, lr_s, hr_s, z_s)

    np.testing.assert_allclose(
        float(m_single["total"]), float(m_shard["total"]), rtol=2e-4
    )
    a = jax.tree.leaves(s_single.params_G)[0]
    b = jax.tree.leaves(s_shard.params_G)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3,
                               atol=1e-6)


def test_dp_tp_step_runs(gan, rng):
    mesh = make_mesh(4, 2)
    lr, hr, z = make_batch(rng, n=4)
    state = gan.init_state(jax.random.key(1), (4, 4, 4, 4, 4), (4, 16, 16, 4, 3))
    state = shard_state(state, mesh)
    ds = batch_sharding(mesh)
    lr, hr, z = (jax.device_put(a, ds) for a in (lr, hr, z))
    for _ in range(3):  # crosses a G→D boundary with period=2
        state, m = gan.train_step(state, lr, hr, z, augment=True)
    assert np.isfinite(float(m["D_train_loss"])) or np.isfinite(
        float(m["total"])
    )
    assert int(state.it) == 3


def test_dp_fused_trunk_shard_map_matches_single(rng):
    """The Pallas fused no-grad forward runs under shard_map on DP-only
    meshes; its result must match the single-device fused forward."""
    cfg = tiny_cfg()
    cfg.use_fused_trunk = True
    cfg.generator.dropout_probability = 0.0
    x = np.arange(16, dtype=np.float32) * 150

    gan_single = WindFieldGAN(cfg, x, x)
    assert gan_single.use_fused_trunk and not gan_single._fused_shard_map
    state = gan_single.init_state(
        jax.random.key(0), (8, 4, 4, 4, 4), (8, 16, 16, 4, 3)
    )
    lr, hr, z = make_batch(rng, n=8)
    ref = np.asarray(gan_single.generate(state.params_G, lr, z))

    mesh = make_mesh(8, 1)
    gan_dp = WindFieldGAN(cfg, x, x, mesh=mesh)
    assert gan_dp._fused_shard_map
    ds = batch_sharding(mesh)
    lr_s, z_s = (jax.device_put(a, ds) for a in (lr, z))
    got = np.asarray(gan_dp.generate(state.params_G, lr_s, z_s))
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=1e-6)

    # and the full D-branch train step runs on the mesh with the kernel
    from gan_sr_wind_field_tpu.parallel import shard_state

    s = shard_state(
        gan_dp.init_state(
            jax.random.key(1), (8, 4, 4, 4, 4), (8, 16, 16, 4, 3)
        ),
        mesh,
    )
    s = s.replace(it=jnp.int32(2))  # period=2, ratio=1 → D block
    hr_s = jax.device_put(hr, ds)
    s, m = gan_dp.train_step(s, lr_s, hr_s, z_s)
    assert np.isfinite(float(m["D_train_loss"]))


def test_pad_batch_to():
    from gan_sr_wind_field_tpu.parallel.mesh import pad_batch_to

    b = np.arange(5 * 2).reshape(5, 2).astype(np.float32)
    padded, n = pad_batch_to(b, 4)
    assert padded.shape == (8, 2) and n == 5
    np.testing.assert_array_equal(padded[:5], b)
    np.testing.assert_array_equal(padded[5:], np.repeat(b[:1], 3, axis=0))
    same, n2 = pad_batch_to(b[:4], 4)
    assert same.shape == (4, 2) and n2 == 4
