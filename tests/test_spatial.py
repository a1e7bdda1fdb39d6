"""Spatial (x-axis) sharding tests on the virtual 8-device CPU mesh.

The reference handles large volumes only by random patch slicing
(process_data.py:159-176); the TPU framework additionally shards the x
spatial axis over a mesh axis — GSPMD spatially partitions every conv and
inserts the halo exchanges, so full volumes larger than one chip's HBM train
with identical math. These tests pin the parity: a spatially-sharded forward
and a full spatially-sharded train step must match the single-device result.
"""

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from gan_sr_wind_field_tpu.parallel import (
    make_mesh,
    shard_state,
    volume_sharding,
)
from test_train_step import make_batch, tiny_cfg

from gan_sr_wind_field_tpu.train.gan import WindFieldGAN


def test_mesh_with_spatial_axis():
    mesh = make_mesh(2, 1, 4)
    assert dict(mesh.shape) == {"data": 2, "model": 1, "spatial": 4}
    sh = volume_sharding(mesh)
    assert sh.spec == P("data", "spatial")
    # no spatial axis → plain batch sharding
    assert volume_sharding(make_mesh(8, 1)).spec == P("data")


def test_generator_forward_spatial_parity(rng):
    cfg = tiny_cfg()
    x = np.arange(16, dtype=np.float32) * 150
    gan = WindFieldGAN(cfg, x, x)
    state = gan.init_state(
        jax.random.key(0), (2, 4, 4, 4, 4), (2, 16, 16, 4, 3)
    )
    lr, hr, z = make_batch(rng)

    ref = np.asarray(gan.generate(state.params_G, lr, z))

    mesh = make_mesh(2, 1, 4)
    vs = volume_sharding(mesh)
    lr_s = jax.device_put(lr, vs)
    z_s = jax.device_put(z, vs)
    got = np.asarray(gan.generate(state.params_G, lr_s, z_s))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=1e-5)


def test_train_step_spatial_parity(rng):
    """Full GAN step with batch+x sharding == unsharded step (same PRNG)."""
    cfg = tiny_cfg()
    x = np.arange(16, dtype=np.float32) * 150
    gan = WindFieldGAN(cfg, x, x)
    lr, hr, z = make_batch(rng)
    state0 = gan.init_state(
        jax.random.key(0), (2, 4, 4, 4, 4), (2, 16, 16, 4, 3)
    )

    s_single = jax.tree.map(jnp.copy, state0)
    for _ in range(3):  # crosses the G→D alternation boundary (period=2)
        s_single, m_single = gan.train_step(s_single, lr, hr, z)

    mesh = make_mesh(2, 1, 4)
    vs = volume_sharding(mesh)
    s_shard = shard_state(jax.tree.map(jnp.copy, state0), mesh)
    lr_s, hr_s, z_s = (jax.device_put(a, vs) for a in (lr, hr, z))
    for _ in range(3):
        s_shard, m_shard = gan.train_step(s_shard, lr_s, hr_s, z_s)

    # 3 steps of compounded f32 drift: spatial conv partitioning
    # reassociates reductions, so parity is loose-tolerance not bit-exact
    np.testing.assert_allclose(
        float(m_single["D_train_loss"]), float(m_shard["D_train_loss"]),
        rtol=1e-3, atol=1e-6,
    )
    a = jax.tree.leaves(s_single.params_G)[0]
    b = jax.tree.leaves(s_shard.params_G)[0]
    np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-6
    )


def test_dp_tp_sp_step_runs(rng):
    """All three mesh axes at once (2×2×2), with on-device augmentation."""
    cfg = tiny_cfg()
    cfg.generator.num_features = 16  # divisible by tp=2
    x = np.arange(16, dtype=np.float32) * 150
    gan = WindFieldGAN(cfg, x, x)
    mesh = make_mesh(2, 2, 2)
    lr, hr, z = make_batch(rng)
    state = gan.init_state(
        jax.random.key(1), (2, 4, 4, 4, 4), (2, 16, 16, 4, 3)
    )
    state = shard_state(state, mesh)
    vs = volume_sharding(mesh)
    lr, hr, z = (jax.device_put(a, vs) for a in (lr, hr, z))
    for _ in range(3):
        state, m = gan.train_step(state, lr, hr, z, augment=True)
    assert np.isfinite(float(m["D_train_loss"])) or np.isfinite(
        float(m["total"])
    )
    assert int(state.it) == 3
