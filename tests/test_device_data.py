"""Device-resident batcher (data/device_data.py): exactness of the
on-device patch slicing vs the host reformat path, bounds and
distribution of the Beta corner-biased offsets, and sharded output.

The source volumes encode (sample, x, y, z-level) into the field values,
so every produced patch can be decoded back to its origin and checked
element-for-element.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gan_sr_wind_field_tpu.data.device_data import DeviceBatcher
from gan_sr_wind_field_tpu.data.transform import NormStats

N, X, Y, ZL = 5, 24, 24, 4
P, CF = 8, 2


class FakeDataset:
    """Duck-typed WindDataset: u encodes (n, x, y, zl) positionally."""

    def __init__(self, enable_slicing=True, slice_size=P, cf=CF):
        self.filenames = [f"s{i}" for i in range(N)]
        self.stats = NormStats(
            z_min=0.0, z_max=1.0, z_above_ground_max=1.0,
            uvw_max=1.0, p_min=0.0, p_max=1.0,
        )
        self.coarseness_factor = cf
        self.include_pressure = False
        self.include_z_channel = True
        self.include_above_ground_channel = False
        self.interpolate_z = False
        self.enable_slicing = enable_slicing
        self.slice_size = slice_size

    def _load(self, name):
        n = int(name[1:])
        xg, yg, zg = np.meshgrid(
            np.arange(X), np.arange(Y), np.arange(ZL), indexing="ij"
        )
        u = (n * 1000.0 + xg + yg / 100.0 + zg / 10000.0).astype(np.float32)
        v, w = u + 0.25, u + 0.5
        z = (n + xg / 100.0 + zg).astype(np.float32)
        zag = np.zeros_like(z)
        p = np.zeros_like(z)
        return z, zag, u, v, w, p


def _decode(u000):
    """u[0,0,0] of a patch → (n, xs, ys)."""
    n = int(round(u000 // 1000))
    rem = u000 - n * 1000.0
    xs = int(round(rem // 1))
    ys = int(round((rem - xs) * 100.0))
    return n, xs, ys


def test_patches_decode_and_match_source_exactly():
    ds = FakeDataset()
    b = DeviceBatcher(ds, batch_size=6, seed=0)
    it = iter(b)
    lr, hr, z = next(it)
    assert hr.shape == (6, P, P, ZL, 3)
    assert lr.shape == (6, P // CF, P // CF, ZL, 4)
    assert z.shape == (6, P, P, ZL, 1)

    hr_h, lr_h, z_h = map(np.asarray, (hr, lr, z))
    for bi in range(6):
        n, xs, ys = _decode(float(hr_h[bi, 0, 0, 0, 0]))
        assert 0 <= xs <= X - P and 0 <= ys <= Y - P
        zf, _, uf, vf, wf, _ = ds._load(f"s{n}")
        win = np.s_[xs:xs + P, ys:ys + P, :]
        np.testing.assert_array_equal(hr_h[bi, ..., 0], uf[win])
        np.testing.assert_array_equal(hr_h[bi, ..., 1], vf[win])
        np.testing.assert_array_equal(hr_h[bi, ..., 2], wf[win])
        np.testing.assert_array_equal(z_h[bi, ..., 0], zf[win])
        # LR = decimation OF THE PATCH (all channels), z channel normalized
        np.testing.assert_array_equal(
            lr_h[bi, ..., :3], hr_h[bi, ::CF, ::CF, :, :]
        )
        np.testing.assert_array_equal(
            lr_h[bi, ..., 3], z_h[bi, ::CF, ::CF, :, 0]
        )


def test_offsets_are_corner_biased_and_streams_differ():
    ds = FakeDataset()
    b = DeviceBatcher(ds, batch_size=16, seed=1)
    it = iter(b)
    offs, samples = [], []
    first = None
    for _ in range(12):
        lr, hr, _ = next(it)
        if first is None:
            first = np.asarray(hr)
        for bi in range(hr.shape[0]):
            n, xs, ys = _decode(float(hr[bi, 0, 0, 0, 0]))
            offs += [xs, ys]
            samples.append(n)
    offs = np.asarray(offs)
    assert offs.min() == 0 and offs.max() == X - P  # corners reached
    # Beta(0.25,0.25): ~73% of mass in the outer 10% each side at this size
    frac_corner = np.mean((offs <= 1) | (offs >= X - P - 1))
    assert frac_corner > 0.4
    assert len(set(samples)) == N  # every sample drawn
    # successive batches differ (key folding advances)
    lr2, hr2, _ = next(it)
    assert not np.array_equal(first, np.asarray(hr2))


def test_no_slicing_returns_full_volumes():
    ds = FakeDataset(enable_slicing=False)
    b = DeviceBatcher(ds, batch_size=3, seed=0)
    lr, hr, z = next(iter(b))
    assert hr.shape == (3, X, Y, ZL, 3)
    assert lr.shape == (3, X // CF, Y // CF, ZL, 4)
    for bi in range(3):
        n, xs, ys = _decode(float(hr[bi, 0, 0, 0, 0]))
        assert (xs, ys) == (0, 0)


def test_train_chunk_equals_single_steps():
    """K chunked steps (one compiled scan with in-graph batch slicing)
    reproduce K single `train_step` calls fed the SAME slice_batch
    batches — losses and final params must match."""
    from gan_sr_wind_field_tpu.config import Config
    from gan_sr_wind_field_tpu.data.device_data import slice_batch
    from gan_sr_wind_field_tpu.train.gan import WindFieldGAN

    scale = 4  # generator geometry needs the reference upscale factors
    cfg = Config()
    cfg.scale = scale
    cfg.compute_dtype = "float32"
    cfg.gan_config.include_pressure = False
    cfg.gan_config.include_z_channel = True
    cfg.gan_config.number_of_z_layers = ZL
    cfg.gan_config.enable_slicing = True
    PQ = 16  # D head needs >=16^3 patches
    cfg.gan_config.slice_size = PQ
    g = cfg.generator
    g.num_features = 8
    g.num_RRDB = 1
    g.num_RDB_convs = 2
    g.RDB_growth_chan = 4
    g.hr_kern_size = 3
    g.terrain_number_of_features = 4
    g.dropout_probability = 0.0
    cfg.discriminator.num_features = 4
    t = cfg.training
    t.d_g_train_period = 2
    t.d_g_train_ratio = 1

    ds = FakeDataset(cf=scale)
    # stats that keep magnitudes sane for the model
    ds.stats = NormStats(0.0, 8.0, 1.0, 6000.0, 0.0, 1.0)
    from gan_sr_wind_field_tpu.data.device_data import (
        load_resident_volumes,
    )
    full_np, zraw_np = load_resident_volumes(ds)
    full, zraw = jnp.asarray(full_np), jnp.asarray(zraw_np)

    # physics-grid coords are patch-sized (uniform spacing), as in training
    xg = np.arange(PQ, dtype=np.float32) * 150.0
    gan = WindFieldGAN(cfg, xg, xg)
    B, K = 2, 4
    state = gan.init_state(
        jax.random.key(1),
        (B, PQ // scale, PQ // scale, ZL, 4), (B, PQ, PQ, ZL, 3),
    )
    state2 = jax.tree.map(jnp.copy, state)
    key = jax.random.key(7)
    kw = dict(batch_size=B, patch=PQ, patch_y=PQ, cf=scale,
              enable_slicing=True)

    # reference: K single steps, batches from the same fold_in(key, it)
    metrics1 = None
    for _ in range(K):
        k = jax.random.fold_in(key, state.it)
        lr, hr, z = slice_batch(full, zraw, k, **kw)
        state, metrics1 = gan.train_step(state, lr, hr, z, augment=True)

    state2, metrics2 = gan.train_chunk(
        state2, full, zraw, key, n_steps=K, augment=True, **kw
    )

    assert int(state2.it) == int(state.it) == K
    np.testing.assert_allclose(
        float(metrics1["total"]), float(metrics2["total"]), rtol=1e-5
    )
    np.testing.assert_allclose(
        float(metrics1["D_train_loss"]), float(metrics2["D_train_loss"]),
        rtol=1e-5,
    )
    flat1 = jax.tree.leaves(state.params_G)
    flat2 = jax.tree.leaves(state2.params_G)
    for a, b in zip(flat1, flat2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_sharded_batch_lands_on_mesh():
    if len(jax.devices()) < 2:
        pytest.skip("needs multi-device mesh")
    mesh = jax.sharding.Mesh(np.array(jax.devices()[:2]), ("data",))
    sh = jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec("data")
    )
    ds = FakeDataset()
    b = DeviceBatcher(ds, batch_size=4, seed=0, sharding=sh)
    lr, hr, z = next(iter(b))
    assert hr.sharding.is_equivalent_to(sh, hr.ndim)
    # replicated residents, sharded batches
    assert len(b._full.sharding.device_set) == 2


def test_resumed_batcher_continues_stream_not_replays():
    # ADVICE r3: a resumed leg re-derives the same seed from fixed_seed,
    # so without start_count it would replay the previous leg's batches.
    ds = FakeDataset()
    a = iter(DeviceBatcher(ds, batch_size=4, seed=7))
    first_leg = [np.asarray(next(a)[1]) for _ in range(5)]
    resumed = iter(DeviceBatcher(ds, batch_size=4, seed=7, start_count=3))
    cont = np.asarray(next(resumed)[1])
    np.testing.assert_array_equal(cont, first_leg[3])  # continues at 3
    assert not np.array_equal(cont, first_leg[0])      # does not replay
