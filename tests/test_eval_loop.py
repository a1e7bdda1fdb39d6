"""End-to-end evaluation-loop test: CSV schema, averages row, field dumps
(reference test.py contract) on synthetic data with a tiny model."""

import csv
import os

import numpy as np

import jax

from gan_sr_wind_field_tpu.config import Config
from gan_sr_wind_field_tpu.data import preprocess
from gan_sr_wind_field_tpu.eval.test_loop import field_metrics, run_test
from gan_sr_wind_field_tpu.train.gan import WindFieldGAN
from gan_sr_wind_field_tpu.utils.logging import setup_loggers


def _tiny_cfg(tmp_path):
    cfg = Config()
    cfg.name = "eval_smoke"
    cfg.scale = 4
    cfg.compute_dtype = "float32"
    cfg.env.data_root = str(tmp_path / "data")
    cfg.env.this_runs_folder = str(tmp_path / "run")
    cfg.gan_config.include_pressure = False
    cfg.gan_config.include_z_channel = True
    cfg.gan_config.number_of_z_layers = 4
    cfg.gan_config.enable_slicing = False
    cfg.gan_config.interpolate_z = False
    g = cfg.generator
    g.num_features = 8
    g.num_RRDB = 1
    g.num_RDB_convs = 2
    g.RDB_growth_chan = 4
    g.hr_kern_size = 3
    g.terrain_number_of_features = 4
    g.use_remat = False
    cfg.discriminator.num_features = 4
    return cfg


class TestFieldMetrics:
    def test_perfect_prediction(self, rng):
        hr = rng.standard_normal((8, 8, 4, 3)).astype(np.float32)
        m = field_metrics(hr, hr, hr * 0.5, uvw_max=32.0)
        assert m["PSNR"] > 80
        assert m["pix"] == 0.0
        assert m["relative_error"] == 0.0
        assert m["trilinear_pix"] > 0

    def test_relative_error_is_ratio_of_means(self, rng):
        # reference semantics (test.py:334-374): mean err length / mean HR
        # length — NOT the mean of per-voxel ratios
        hr = np.ones((4, 4, 2, 3), np.float32)
        sr = hr.copy()
        sr[0, 0, 0] += 1.0  # one bad voxel
        m = field_metrics(hr, sr, hr, uvw_max=1.0)
        err_len = np.sqrt(3.0) / (4 * 4 * 2)
        hr_len = np.sqrt(3.0)
        np.testing.assert_allclose(
            m["relative_error"], err_len / hr_len, rtol=1e-5
        )


class TestRunTest:
    def test_csv_and_fields(self, tmp_path):
        cfg = _tiny_cfg(tmp_path)
        setup_loggers(str(tmp_path / "log"), also_log_to_terminal=False)
        # 128x128 synthetic volumes but tiny z; shrink via number_of_z_layers
        ds_train, ds_test, _, x, y = preprocess(
            cfg, synthetic=True, synthetic_hours=16
        )
        assert len(ds_test) >= 1

        gan = WindFieldGAN(cfg, x, y)
        probe = ds_test.get(0, np.random.default_rng(0))
        state = gan.init_state(
            jax.random.key(0), (1,) + probe[0].shape, (1,) + probe[1].shape
        )
        out_root = str(tmp_path / "test_output")
        avgs = run_test(cfg, ds_test, x, y, state=state, output_root=out_root)

        metrics_csv = os.path.join(out_root, "eval_smoke____metrics.csv")
        assert os.path.exists(metrics_csv)
        with open(metrics_csv) as f:
            rows = list(csv.reader(f))
        assert rows[0][0] == "field"
        assert len(rows) == 1 + len(ds_test)
        assert os.path.exists(os.path.join(out_root, "averages.csv"))
        fields_dir = os.path.join(cfg.env.this_runs_folder, "fields")
        assert any(n.startswith("test_fields_") for n in os.listdir(fields_dir))
        assert np.isfinite(avgs["PSNR"])
        # untrained generator must not beat trilinear
        assert avgs["PSNR_trilinear"] > 0
