"""Real-data pipeline integration proof (no network): locally synthesized
raw HARMONIE-style .nc files drive the SAME path a real download would —
``preprocess(cfg, synthetic=False)`` → downloader → hourly cache → signed-max
norm stats → chronological split → ``WindDataset`` → train loop → test loop.

This is the non-synthetic branch of run.py end to end; only the network
fetch itself is absent (raw files are pre-seeded; ``urlretrieve`` is
monkeypatched to fail loudly if anything tries to reach out). Reference
path under test: download_data.py:403-481 → process_data.py:497-639 →
train.py / test.py.
"""

import os
from datetime import date, timedelta

import numpy as np
import pytest

from gan_sr_wind_field_tpu.config import Config
from gan_sr_wind_field_tpu.data import downloader, preprocess
from gan_sr_wind_field_tpu.train import checkpoint as ckpt
from gan_sr_wind_field_tpu.train.loop import train
from gan_sr_wind_field_tpu.utils.logging import setup_loggers

from test_downloader_integration import _write_fake_nc

pytestmark = pytest.mark.slow  # multi-minute integration tier (VERDICT r2 weak 5)

# raw grid chosen so the fixed reference crop (x 4:-4, y 4:-3) yields a
# 16x16 HR plane — big enough for scale-4 training with slice_size=16
NX_RAW, NY_RAW, NZ = 24, 23, 3
START = date(2018, 3, 7)
N_DAYS = 3


@pytest.fixture()
def seeded_cfg(tmp_path, monkeypatch):
    raw_dir = tmp_path / "downloaded_raw_bessaker_data"
    raw_dir.mkdir()
    for d in range(N_DAYS):
        day = START + timedelta(days=d)
        for s, stamp in enumerate(("T00Z.nc", "T12Z.nc")):
            _write_fake_nc(
                str(raw_dir / downloader.raw_filename(day, stamp)),
                nx=NX_RAW, ny=NY_RAW, poison_hour=None, seed=2 * d + s,
            )

    import urllib.request

    def _no_network(url, local):
        raise AssertionError(f"pipeline tried the network: {url}")

    monkeypatch.setattr(urllib.request, "urlretrieve", _no_network)

    cfg = Config()
    cfg.scale = 4
    cfg.compute_dtype = "float32"
    cfg.use_tensorboard_logger = False
    cfg.display_bar = False
    cfg.env.data_root = str(tmp_path)
    cfg.env.this_runs_folder = str(tmp_path / "run")
    cfg.env.this_runs_tensorboard_log_folder = str(tmp_path / "run" / "tb")
    g = cfg.gan_config
    g.include_pressure = False
    g.include_z_channel = True
    g.number_of_z_layers = NZ
    g.enable_slicing = True
    g.slice_size = 16
    g.interpolate_z = False
    g.start_date = [START.year, START.month, START.day]
    end = START + timedelta(days=N_DAYS - 1)
    g.end_date = [end.year, end.month, end.day]
    gen = cfg.generator
    gen.num_features = 8
    gen.num_RRDB = 1
    gen.num_RDB_convs = 2
    gen.RDB_growth_chan = 4
    gen.hr_kern_size = 3
    gen.terrain_number_of_features = 4
    cfg.discriminator.num_features = 4
    t = cfg.training
    t.niter = 4
    t.val_period = 2
    t.log_period = 2
    t.save_model_period = 4
    t.d_g_train_period = 2
    t.d_g_train_ratio = 1
    cfg.dataset_train.batch_size = 2
    cfg.dataset_val.batch_size = 2
    setup_loggers(str(tmp_path / "log"), also_log_to_terminal=False)
    return cfg


def test_preprocess_train_and_eval_from_raw_nc(seeded_cfg, tmp_path):
    cfg = seeded_cfg

    # non-synthetic preprocess: empty cache → downloader over the seeded
    # raw files → stats/split/datasets (the exact run.py --train path)
    ds_train, ds_test, ds_val, x, y = preprocess(cfg, synthetic=False)
    n_total = N_DAYS * 24  # two sims/day x 12 valid hours each
    assert len(ds_train) == int(n_total * 0.8)
    assert len(ds_test) == int(n_total * 0.1)
    assert len(ds_val) == n_total - len(ds_train) - len(ds_test)

    # samples carry the cropped real-grid geometry
    lr, hr, zc = ds_train.get(0, np.random.default_rng(0))
    assert hr.shape == (16, 16, NZ, 3)
    assert lr.shape[0:3] == (4, 4, NZ)
    assert np.isfinite(hr).all() and np.isfinite(lr).all()

    # norm factors persisted next to the cache (reference parity)
    from gan_sr_wind_field_tpu.data import files as dfiles

    folder = dfiles.dataset_folder(str(tmp_path), f"bessaker_z{NZ}")
    assert os.path.isfile(dfiles.norm_factors_path(folder))

    # train 4 its (G/D alternation + val sweep) on the real-path datasets
    state = train(cfg, ds_train, ds_val, x, y)
    assert int(state.it) == 4
    assert ckpt.latest_checkpoint(cfg.env.this_runs_folder) is not None

    # evaluation chain over the held-out real-path test split
    from gan_sr_wind_field_tpu.eval.test_loop import run_test

    out_dir = str(tmp_path / "test_output")
    run_test(cfg, ds_test, x, y, state=state, output_root=out_dir)
    csvs = [n for n in os.listdir(out_dir) if n.endswith(".csv")]
    assert "averages.csv" in csvs and len(csvs) >= 2
