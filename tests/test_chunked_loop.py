"""Chunked hot loop (steps_per_dispatch>1) through the real train()
driver: chunk/boundary alignment, validation + checkpoint firing, and
single-step remainder fills when a boundary is not chunk-aligned."""

import os

import numpy as np

from gan_sr_wind_field_tpu.config import Config
from gan_sr_wind_field_tpu.data import preprocess
from gan_sr_wind_field_tpu.train import checkpoint as ckpt
from gan_sr_wind_field_tpu.train.loop import train
from gan_sr_wind_field_tpu.utils.logging import setup_loggers


def _cfg(tmp_path, niter=7, chunk=2):
    cfg = Config()
    cfg.scale = 4
    cfg.compute_dtype = "float32"
    cfg.use_tensorboard_logger = False
    cfg.display_bar = False
    cfg.device_resident_data = True
    cfg.steps_per_dispatch = chunk
    cfg.env.data_root = str(tmp_path / "data")
    cfg.env.this_runs_folder = str(tmp_path / "run")
    cfg.env.this_runs_tensorboard_log_folder = str(tmp_path / "run" / "tb")
    cfg.gan_config.include_pressure = False
    cfg.gan_config.include_z_channel = True
    cfg.gan_config.number_of_z_layers = 4
    cfg.gan_config.interpolate_z = False
    cfg.gan_config.enable_slicing = True
    cfg.gan_config.slice_size = 16
    g = cfg.generator
    g.num_features = 8
    g.num_RRDB = 1
    g.num_RDB_convs = 2
    g.RDB_growth_chan = 4
    g.hr_kern_size = 3
    g.terrain_number_of_features = 4
    cfg.discriminator.num_features = 4
    t = cfg.training
    t.niter = niter
    t.val_period = 4
    t.log_period = 2
    t.save_model_period = 4
    t.d_g_train_period = 2
    t.d_g_train_ratio = 1
    cfg.dataset_train.batch_size = 2
    cfg.dataset_val.batch_size = 2
    return cfg


def test_chunked_loop_hits_boundaries_and_finishes(tmp_path):
    # niter=7, chunk=2, val/save at 4: chunks 2+2, then val+ckpt at 4,
    # chunk 2 to 6, single-step fill to 7 — exercises both paths
    cfg = _cfg(tmp_path, niter=7, chunk=2)
    setup_loggers(str(tmp_path / "log"), also_log_to_terminal=False)
    ds_train, _, ds_val, x, y = preprocess(
        cfg, synthetic=True, synthetic_hours=10, synthetic_size=32
    )
    state = train(cfg, ds_train, ds_val, x, y)
    assert int(state.it) == 7
    # the it-4 boundary fired: checkpoint + validation figure
    assert ckpt.latest_checkpoint(cfg.env.this_runs_folder) is not None
    imgs = os.listdir(os.path.join(cfg.env.this_runs_folder, "images"))
    assert any("it_4" in n for n in imgs)
    # losses finite end-to-end
    assert np.isfinite(float(state.it))


def test_resumed_device_resident_leg_continues_batch_stream(
    tmp_path, monkeypatch
):
    """ADVICE r3 integration: train() must hand the resumed iteration to
    DeviceBatcher (start_count) so leg 2 continues the batch stream
    instead of replaying leg 1's (the seed re-derives from fixed_seed)."""
    import gan_sr_wind_field_tpu.data.device_data as dd
    import gan_sr_wind_field_tpu.train.loop as loop_mod

    captured = []
    real = dd.DeviceBatcher

    class Spy(real):
        def __init__(self, *a, **kw):
            captured.append(kw.get("start_count"))
            super().__init__(*a, **kw)

    monkeypatch.setattr(dd, "DeviceBatcher", Spy)

    cfg = _cfg(tmp_path, niter=3, chunk=1)
    setup_loggers(str(tmp_path / "log"), also_log_to_terminal=False)
    ds_train, _, ds_val, x, y = preprocess(
        cfg, synthetic=True, synthetic_hours=10, synthetic_size=32
    )
    train(cfg, ds_train, None, x, y)
    assert captured == [0]

    cfg2 = _cfg(tmp_path, niter=6, chunk=1)
    cfg2.env.this_runs_folder = str(tmp_path / "run2")
    cfg2.env.this_runs_tensorboard_log_folder = str(tmp_path / "run2/tb")
    cfg2.load_model_from_save = True
    cfg2.training.resume_training_from_save = True
    cfg2.env.state_load_path = ckpt.latest_checkpoint(
        cfg.env.this_runs_folder
    )
    state = train(cfg2, ds_train, None, x, y)
    assert int(state.it) == 6
    assert captured == [0, 3]  # leg 2 continues the stream at it=3
