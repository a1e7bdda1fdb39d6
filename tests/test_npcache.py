"""Memmap sample-cache tests: content parity with pickle loads, per-split
isolation, idempotent rebuild."""

import numpy as np

from gan_sr_wind_field_tpu.data import files as dfiles
from gan_sr_wind_field_tpu.data.npcache import MemmapSource, build_memmap_cache
from gan_sr_wind_field_tpu.data.synthetic import generate_synthetic_cache


def test_memmap_matches_pickles(tmp_path):
    names, sub = generate_synthetic_cache(
        str(tmp_path), num_hours=6, nx=16, ny=16, nz=4
    )
    folder = dfiles.dataset_folder(str(tmp_path), sub)
    src = MemmapSource(folder, names)
    for name in names[:3]:
        ref = dfiles.read_sample(folder, name)
        got = src.load(name)
        for a, b in zip(got, ref):
            np.testing.assert_allclose(a, np.asarray(b, np.float32), rtol=1e-6)


def test_split_caches_are_separate(tmp_path):
    names, sub = generate_synthetic_cache(
        str(tmp_path), num_hours=6, nx=8, ny=8, nz=4
    )
    folder = dfiles.dataset_folder(str(tmp_path), sub)
    p1 = build_memmap_cache(folder, names[:4])
    p2 = build_memmap_cache(folder, names[4:])
    assert p1 != p2
    # idempotent: second call returns without rebuilding
    assert build_memmap_cache(folder, names[:4]) == p1


def test_dataset_get_identical_with_source(tmp_path):
    from gan_sr_wind_field_tpu.config import Config
    from gan_sr_wind_field_tpu.data import preprocess

    cfg = Config()
    cfg.env.data_root = str(tmp_path)
    cfg.gan_config.enable_slicing = False
    cfg.gan_config.interpolate_z = False
    ds_train, _, _, _, _ = preprocess(cfg, synthetic=True, synthetic_hours=6)
    a = ds_train.get(1, np.random.default_rng(5))
    ds_train.use_npcache()
    b = ds_train.get(1, np.random.default_rng(5))
    for xa, xb in zip(a, b):
        # memmap stores f32; pickle path computes in f64 then casts
        np.testing.assert_allclose(xa, xb, rtol=1e-4, atol=1e-6)
