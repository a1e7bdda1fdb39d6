"""Data pipeline tests: augmentation equivariance (torch oracle), reformat,
z-interpolation (np.interp oracle), synthetic cache + dataset + split."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from gan_sr_wind_field_tpu.data import (
    chronological_split,
    filenames_from_dates,
    generate_synthetic_cache,
    preprocess,
    reformat_sample,
)
from gan_sr_wind_field_tpu.data.augment import (
    _flip_single,
    _rot90_single,
    augment_batch,
    augment_sample_np,
    flip_vector_field_np,
    rot90_vector_field_np,
)
from gan_sr_wind_field_tpu.data.dataset import aggregate_norm_stats
from gan_sr_wind_field_tpu.data.transform import NormStats
from gan_sr_wind_field_tpu.data.zinterp import (
    _interp_columns,
    interpolate_z_columns,
    reverse_interpolate_z_columns,
)
from gan_sr_wind_field_tpu.config import Config
from datetime import date



def _torch_rot_reference(hr_cf, k):
    """Reference rotation semantics on channel-first (C,X,Y,Z) torch tensors
    (process_data.py:198-248)."""
    HR = torch.rot90(torch.from_numpy(hr_cf), k, [1, 2])
    if k == 1:
        HR[:2] = torch.cat((-HR[1:2], HR[0:1]), 0)
    elif k == 2:
        HR[:2] = torch.cat((-HR[0:1], -HR[1:2]), 0)
    elif k == 3:
        HR[:2] = torch.cat((HR[1:2], -HR[0:1]), 0)
    return HR.numpy()


class TestAugmentNumpy:
    @pytest.mark.parametrize("k", [0, 1, 2, 3])
    def test_rot90_matches_reference_semantics(self, rng, k):
        hr = rng.standard_normal((8, 8, 4, 3)).astype(np.float32)
        got = rot90_vector_field_np(hr, k)
        ref = np.moveaxis(
            _torch_rot_reference(np.moveaxis(hr, -1, 0).copy(), k), 0, -1
        )
        np.testing.assert_allclose(got, ref)

    @pytest.mark.parametrize("axis", [0, 1])
    def test_flip_negates_component(self, rng, axis):
        hr = rng.standard_normal((8, 8, 4, 3)).astype(np.float32)
        got = flip_vector_field_np(hr, axis)
        ref = np.flip(hr, axis=axis).copy()
        ref[..., axis] = -ref[..., axis]
        np.testing.assert_allclose(got, ref)

    def test_rotation_preserves_speed(self, rng):
        hr = rng.standard_normal((8, 8, 4, 3)).astype(np.float32)
        speed = np.linalg.norm(hr, axis=-1)
        for k in range(4):
            rot = rot90_vector_field_np(hr, k)
            np.testing.assert_allclose(
                np.sort(np.linalg.norm(rot, axis=-1).ravel()),
                np.sort(speed.ravel()),
                rtol=1e-5,
            )


class TestAugmentJax:
    @pytest.mark.parametrize("k", [0, 1, 2, 3])
    def test_rot_matches_numpy(self, rng, k):
        hr = rng.standard_normal((8, 8, 4, 3)).astype(np.float32)
        got = np.asarray(_rot90_single(jnp.asarray(hr), jnp.asarray(k), True))
        np.testing.assert_allclose(got, rot90_vector_field_np(hr, k), rtol=1e-6)

    @pytest.mark.parametrize("fx,fy", [(0, 0), (1, 0), (0, 1), (1, 1)])
    def test_flip_matches_numpy(self, rng, fx, fy):
        hr = rng.standard_normal((8, 8, 4, 3)).astype(np.float32)
        got = np.asarray(
            _flip_single(jnp.asarray(hr), jnp.asarray(bool(fx)), jnp.asarray(bool(fy)), True)
        )
        ref = hr
        if fx:
            ref = flip_vector_field_np(ref, 0)
        if fy:
            ref = flip_vector_field_np(ref, 1)
        np.testing.assert_allclose(got, ref)

    def test_batched_augment_shapes_and_determinism(self, rng):
        lr = rng.standard_normal((4, 4, 4, 3, 4)).astype(np.float32)
        hr = rng.standard_normal((4, 16, 16, 3, 3)).astype(np.float32)
        z = rng.standard_normal((4, 16, 16, 3, 1)).astype(np.float32)
        key = jax.random.key(7)
        o1 = augment_batch(key, jnp.asarray(lr), jnp.asarray(hr), jnp.asarray(z))
        o2 = augment_batch(key, jnp.asarray(lr), jnp.asarray(hr), jnp.asarray(z))
        for a, b in zip(o1, o2):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert o1[0].shape == lr.shape and o1[1].shape == hr.shape


class TestReformat:
    def _stats(self):
        return NormStats(0.0, 600.0, 70.0, 32.0, 90000.0, 105000.0)

    def test_channels_no_extra(self, rng):
        u, v, w = (rng.standard_normal((16, 16, 5)) for _ in range(3))
        z = np.cumsum(rng.random((16, 16, 5)), axis=-1)
        zag = z.copy()
        p = 1e5 * np.ones((16, 16, 5))
        LR, HR, Z = reformat_sample(z, zag, u, v, w, p, self._stats(),
                                    coarseness_factor=4)
        assert HR.shape == (16, 16, 5, 3)
        assert LR.shape == (4, 4, 5, 3)
        assert Z.shape == (16, 16, 5, 1)
        np.testing.assert_allclose(HR[..., 0], u / 32.0, rtol=1e-6)
        np.testing.assert_allclose(LR, HR[::4, ::4], rtol=1e-6)

    def test_channels_full(self, rng):
        u, v, w = (rng.standard_normal((16, 16, 5)) for _ in range(3))
        z = np.cumsum(rng.random((16, 16, 5)), axis=-1)
        zag = z * 0.5
        p = 1e5 * np.ones((16, 16, 5))
        LR, HR, Z = reformat_sample(
            z, zag, u, v, w, p, self._stats(), coarseness_factor=4,
            include_pressure=True, include_z_channel=True,
            include_above_ground_channel=True,
        )
        assert LR.shape == (4, 4, 5, 6)  # uvw + p + zag + zrel
        np.testing.assert_allclose(
            LR[..., 3], (1e5 - 90000.0) / 15000.0, rtol=1e-6
        )


    def test_for_plotting_appends_pressure_to_hr(self, rng):
        # reference process_data.py:446-450: plotting mode carries the
        # normalized pressure as a 4th HR channel; LR is unchanged
        u, v, w = (rng.standard_normal((16, 16, 5)) for _ in range(3))
        z = np.cumsum(rng.random((16, 16, 5)), axis=-1)
        p = 1e5 * np.ones((16, 16, 5))
        lr, hr, _ = reformat_sample(
            z, z, u, v, w, p, self._stats(), coarseness_factor=4,
            include_pressure=True, for_plotting=True,
        )
        lr2, hr2, _ = reformat_sample(
            z, z, u, v, w, p, self._stats(), coarseness_factor=4,
            include_pressure=True,
        )
        assert hr.shape[-1] == 4 and hr2.shape[-1] == 3
        np.testing.assert_allclose(hr[..., 3], (1e5 - 90000.0) / 15000.0)
        np.testing.assert_array_equal(lr, lr2)


class TestZInterp:
    def test_interp_columns_matches_np_interp(self, rng):
        x_old = np.cumsum(0.5 + rng.random((5, 6, 10)), axis=-1)
        y_old = rng.standard_normal((5, 6, 10))
        x_new = np.cumsum(0.4 + rng.random((5, 6, 10)), axis=-1)
        got = _interp_columns(x_new, x_old, y_old)
        for i in range(5):
            for j in range(6):
                ref = np.interp(x_new[i, j], x_old[i, j], y_old[i, j])
                np.testing.assert_allclose(got[i, j], ref, rtol=1e-6, atol=1e-9)

    def test_roundtrip(self, rng):
        nx, ny, nz = 6, 5, 10
        terrain = 100.0 * rng.random((nx, ny))
        zag = np.cumsum(1.0 + rng.random((nx, ny, nz)), axis=-1) * 5
        u = np.cumsum(rng.standard_normal((nx, ny, nz)), axis=-1)
        v, w, p = u * 0.5, u * 0.1, 1e5 - u
        x = np.arange(nx, dtype=float)
        y = np.arange(ny, dtype=float)
        z_i, zag_i, u_i, v_i, w_i, p_i = interpolate_z_columns(
            x, y, zag.copy(), u.copy(), v.copy(), w.copy(), p.copy(), terrain
        )
        assert np.allclose(zag_i[0, 0], zag_i[-1, -1])  # shared regular grid
        # reverse interp returns approximately the original on interior levels
        back = reverse_interpolate_z_columns(u_i, zag, zag_i)
        mask = (zag > zag_i[..., :1]) & (zag < zag_i[..., -1:])
        err = np.abs(back - u)[mask]
        assert np.median(err) < 0.3  # linear-interp error on smooth columns


class TestDatasetAndSplit:
    def test_filenames(self):
        names = filenames_from_dates(date(2018, 3, 1), date(2018, 3, 3))
        assert len(names) == 72
        assert names[0] == "2018-03-01-00.pkl"
        assert names[-1] == "2018-03-03-23.pkl"

    def test_split_ratios(self):
        # note: int(100*(1-0.8)/2) == 9 due to float truncation — the
        # reference has the same behaviour (process_data.py:548-550)
        names = [f"{i}.pkl" for i in range(100)]
        tr, te, va = chronological_split(names, 0.8)
        assert len(tr) == 80 and len(te) == 9 and len(va) == 11
        assert tr[0] == "0.pkl" and te[0] == "80.pkl" and va[0] == "89.pkl"

    def test_synthetic_preprocess_end_to_end(self, tmp_path):
        cfg = Config()
        cfg.env.data_root = str(tmp_path)
        cfg.scale = 4
        cfg.gan_config.include_pressure = False
        cfg.gan_config.include_z_channel = True
        cfg.gan_config.enable_slicing = True
        cfg.gan_config.slice_size = 64
        cfg.gan_config.interpolate_z = False
        ds_train, ds_test, ds_val, x, y = preprocess(
            cfg, synthetic=True, synthetic_hours=20
        )
        # 20*(1-0.8)/2 truncates to 1 (reference float-split semantics)
        assert len(ds_train) == 16 and len(ds_test) == 1 and len(ds_val) == 3
        rng = np.random.default_rng(0)
        lr, hr, z = ds_train.get(0, rng)
        assert hr.shape == (64, 64, 10, 3)
        assert lr.shape == (16, 16, 10, 4)
        assert z.shape == (64, 64, 10, 1)
        assert np.abs(hr).max() <= 1.0 + 1e-6
        # batching
        batch = next(ds_train.batches(2, rng))
        assert batch[0].shape == (2, 16, 16, 10, 4)
        assert batch[1].shape == (2, 64, 64, 10, 3)
        # test split returns extras
        out = ds_test.get(0, rng)
        assert len(out) == 6 and out[3].startswith("2018-")
        assert x.shape == (64,)

    def test_synthetic_size_gives_random_patches(self, tmp_path):
        # synthetic_size > slice_size → true random-patch training
        # (run.py --synthetic_size; the patch comes from a larger domain)
        cfg = Config()
        cfg.env.data_root = str(tmp_path)
        cfg.scale = 4
        cfg.gan_config.include_pressure = False
        cfg.gan_config.include_z_channel = True
        cfg.gan_config.enable_slicing = True
        cfg.gan_config.slice_size = 16
        cfg.gan_config.interpolate_z = False
        ds_train, _, _, x, y = preprocess(
            cfg, synthetic=True, synthetic_hours=8, synthetic_size=32
        )
        # the returned axes are trimmed to the slice extent (uniform spacing
        # → patch offset doesn't change the coordinate deltas the losses use)
        assert x.shape == (16,)
        lr, hr, z = ds_train.get(0, np.random.default_rng(0))
        assert hr.shape == (16, 16, 10, 3)
        # different rng draws → different patch offsets (same sample)
        hs = {ds_train.get(0, np.random.default_rng(s))[1].tobytes()
              for s in range(6)}
        assert len(hs) > 1

    def test_norm_stats_train_only(self, tmp_path):
        names, sub = generate_synthetic_cache(
            str(tmp_path), num_hours=10, nx=16, ny=16, nz=4
        )
        from gan_sr_wind_field_tpu.data import files as dfiles

        folder = dfiles.dataset_folder(str(tmp_path), sub)
        s_all = aggregate_norm_stats(folder, names, 1.0)
        s_train = aggregate_norm_stats(folder, names, 0.5)
        assert s_train.uvw_max <= s_all.uvw_max
        assert s_train.z_max <= s_all.z_max

    def test_seeded_determinism(self, tmp_path):
        cfg = Config()
        cfg.env.data_root = str(tmp_path)
        cfg.gan_config.enable_slicing = True
        cfg.gan_config.slice_size = 32
        ds_train, _, _, _, _ = preprocess(cfg, synthetic=True, synthetic_hours=8)
        ds_train.data_aug_rot = ds_train.data_aug_flip = True
        a = ds_train.get(0, np.random.default_rng(42))
        b = ds_train.get(0, np.random.default_rng(42))
        for xa, xb in zip(a, b):
            np.testing.assert_array_equal(xa, xb)


class TestInterpolateZPath:
    def test_dataset_with_zinterp_and_cache(self, tmp_path):
        from gan_sr_wind_field_tpu.config import Config

        cfg = Config()
        cfg.env.data_root = str(tmp_path)
        cfg.scale = 4
        cfg.gan_config.include_pressure = True
        cfg.gan_config.include_z_channel = True
        cfg.gan_config.interpolate_z = True
        cfg.gan_config.enable_slicing = False
        ds_train, ds_test, _, x, y = preprocess(
            cfg, synthetic=True, synthetic_hours=16
        )
        lr, hr, z = ds_train.get(0, np.random.default_rng(0))
        # after z-interp all columns share one z_above_ground grid -> the
        # raw z (geopotential) differs only by terrain
        assert hr.shape[-1] == 3 and lr.shape[-1] == 5
        import os

        # interp cache populated
        assert len(os.listdir(ds_train.interp_cache_dir)) > 0
        # test split carries the raw-grid extras
        out = ds_test.get(0, np.random.default_rng(0))
        assert out[4] is not None and out[5] is not None
        assert out[4].shape == hr.shape


# core inner-loop tier: `pytest -m smoke` (VERDICT r4 next 8)
pytestmark = pytest.mark.smoke
