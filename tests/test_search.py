"""ASHA + search-driver tests (micro sweep on synthetic data)."""

import numpy as np

from gan_sr_wind_field_tpu.search.asha import ASHAScheduler
from gan_sr_wind_field_tpu.search.driver import (
    INITIAL_POINTS,
    SEARCH_SPACE,
    param_search,
    sample_point,
)
from gan_sr_wind_field_tpu.config import Config
from gan_sr_wind_field_tpu.data import preprocess
from gan_sr_wind_field_tpu.utils.logging import setup_loggers


class TestASHA:
    def test_rungs(self):
        a = ASHAScheduler(max_t=150000, grace_period=1200, reduction_factor=3)
        assert a.rung_iterations() == [1200, 3600, 10800, 32400, 97200]

    def test_promotion(self):
        a = ASHAScheduler(max_t=1000, grace_period=10, reduction_factor=3)
        # first two trials pass optimistically
        assert a.report(10, 30.0)
        assert a.report(10, 35.0)
        # third: cutoff is top-1/3 -> only >= 35 continues
        assert not a.report(10, 20.0)
        assert a.report(10, 36.0)

    def test_max_t_stops(self):
        a = ASHAScheduler(max_t=100)
        assert not a.report(100, 99.0)

    def test_sharded_rungs_match_single_shard(self, tmp_path):
        """Two shards sharing rung files make the same promotion decisions
        as one scheduler seeing the whole population in arrival order."""
        events = [
            (10, 30.0), (10, 35.0), (10, 20.0), (10, 36.0), (10, 34.0),
            (10, 5.0), (30, 33.0), (30, 40.0), (30, 10.0), (30, 39.0),
        ]
        kw = dict(max_t=1000, grace_period=10, reduction_factor=3)
        single = ASHAScheduler(**kw)
        expected = [single.report(it, m) for it, m in events]

        shards = [
            ASHAScheduler(**kw, share_dir=str(tmp_path), shard_index=0),
            ASHAScheduler(**kw, share_dir=str(tmp_path), shard_index=1),
        ]
        got = [
            shards[i % 2].report(it, m) for i, (it, m) in enumerate(events)
        ]
        assert got == expected
        # without sharing, each shard sees only half the population and
        # promotes a trial the full population would have cut
        lone = [ASHAScheduler(**kw), ASHAScheduler(**kw)]
        alone = [lone[i % 2].report(it, m) for i, (it, m) in enumerate(events)]
        assert alone != expected


class TestSampling:
    def test_points_in_bounds(self):
        for i in range(50):
            p = sample_point(i, seed=1)
            for name, (kind, lo, hi) in SEARCH_SPACE.items():
                assert lo <= p[name] <= hi, (name, p[name])

    def test_deterministic(self):
        assert sample_point(7, seed=3) == sample_point(7, seed=3)
        assert sample_point(7, seed=3) != sample_point(8, seed=3)

    def test_initial_points_match_reference_count(self):
        assert len(INITIAL_POINTS) == 10


class TestMicroSweep:
    def test_two_trials_end_to_end(self, tmp_path):
        cfg = Config()
        cfg.scale = 4
        cfg.compute_dtype = "float32"
        cfg.env.data_root = str(tmp_path / "data")
        cfg.env.this_runs_folder = str(tmp_path / "run")
        cfg.gan_config.include_pressure = False
        cfg.gan_config.include_z_channel = True
        cfg.gan_config.number_of_z_layers = 4
        cfg.gan_config.enable_slicing = True
        cfg.gan_config.slice_size = 16
        g = cfg.generator
        g.num_features = 8
        g.num_RRDB = 1
        g.num_RDB_convs = 2
        g.RDB_growth_chan = 4
        g.hr_kern_size = 3
        g.terrain_number_of_features = 4
        g.use_remat = False
        cfg.discriminator.num_features = 4
        t = cfg.training
        t.niter = 4
        t.val_period = 2
        t.d_g_train_period = 2
        cfg.dataset_train.batch_size = 2

        setup_loggers(str(tmp_path / "log"), also_log_to_terminal=False)
        ds_train, _, ds_val, x, y = preprocess(
            cfg, synthetic=True, synthetic_hours=10
        )
        results = param_search(cfg, ds_train, ds_val, x, y, num_samples=2)
        assert len(results) == 2
        assert all(np.isfinite(r["PSNR"]) for r in results)
        import os as _os

        assert _os.path.exists(
            _os.path.join(cfg.env.this_runs_folder, "param_search_best.json")
        )
