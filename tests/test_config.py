"""Config system tests: INI loading, defaults, round-trip, derived fields."""

import os
import pytest

from gan_sr_wind_field_tpu.config import Config, load_config, safe_list_from_string

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LOCAL_INI = os.path.join(REPO, "configs", "local.ini")
CLUSTER_INI = os.path.join(REPO, "configs", "cluster.ini")



def test_defaults():
    cfg = Config()
    assert cfg.scale == 4
    assert cfg.training.d_g_train_period == 50
    assert cfg.generator.num_features == 128
    assert cfg.gan_config.number_of_z_layers == 10


def test_load_local_ini():
    cfg = Config.from_ini(LOCAL_INI)
    assert cfg.name == "local_test"
    assert cfg.scale == 4
    assert cfg.gan_config.include_pressure is False
    assert cfg.gan_config.include_z_channel is True
    assert cfg.gan_config.enable_slicing is True
    assert cfg.gan_config.slice_size == 64
    assert cfg.gan_config.start_date == [2018, 3, 1]
    assert cfg.generator.num_RRDB == 16
    assert cfg.generator.hr_kern_size == 5
    assert cfg.generator.weight_init_scale == 0.1
    assert cfg.discriminator.num_features == 32
    assert cfg.training.learning_rate_g == 8e-5
    assert cfg.training.multistep_lr_steps == [10000, 30000, 50000, 70000, 100000]
    assert cfg.training.gan_type == "relativisticavg"
    assert cfg.training.gradient_xy_loss_weight == 3.064
    assert cfg.training.niter == 10
    assert cfg.dataset_train.batch_size == 1
    assert cfg.dataset_train.data_aug_rot is True


def test_load_cluster_ini():
    cfg = Config.from_ini(CLUSTER_INI)
    assert cfg.training.niter == 150000
    assert cfg.dataset_train.batch_size == 32
    assert cfg.gan_config.start_date == [2017, 8, 4]
    assert cfg.gan_config.end_date == [2020, 10, 25]


def test_roundtrip():
    cfg = Config.from_ini(LOCAL_INI)
    text = cfg.as_ini()
    cfg2 = Config.from_ini_string(text)
    assert cfg2.name == cfg.name
    assert cfg2.training.multistep_lr_steps == cfg.training.multistep_lr_steps
    assert cfg2.generator.num_RRDB == cfg.generator.num_RRDB
    assert cfg2.gan_config.include_z_channel == cfg.gan_config.include_z_channel
    assert cfg2.training.gradient_xy_loss_weight == cfg.training.gradient_xy_loss_weight
    assert cfg2.parallel.data_parallel == cfg.parallel.data_parallel


def test_lr_num_channels():
    # boolean-arithmetic channel count (reference wind_field_GAN_3D.py:92-96)
    cfg = Config.from_ini(LOCAL_INI)
    assert cfg.lr_num_channels == 4  # uvw + z channel
    cfg.gan_config.include_pressure = True
    assert cfg.lr_num_channels == 5
    cfg.gan_config.include_above_ground_channel = True
    assert cfg.lr_num_channels == 6


def test_safe_list_from_string():
    # tolerant parsing (reference config/config.py:384-396)
    assert safe_list_from_string("[1, 2, 3]") == [1, 2, 3]
    assert safe_list_from_string("7") == [7]
    assert safe_list_from_string("garbage[") == []
    assert safe_list_from_string(None) == []


def test_overrides():
    cfg = load_config(LOCAL_INI, scale=8, is_train=True)
    assert cfg.scale == 8 and cfg.is_train


def test_feature_extractor_section_roundtrip(tmp_path):
    """[FEATUREEXTRACTOR] surface parity (reference config/config.py:155-162
    — dead in the reference too, kept for .ini compatibility)."""
    from gan_sr_wind_field_tpu.config import Config

    ini = tmp_path / "fe.ini"
    ini.write_text(
        "[FEATUREEXTRACTOR]\nlow_level_feat_layer = 2\n"
        "high_level_feat_layer = 30\n"
    )
    cfg = Config.from_ini(str(ini))
    assert cfg.feature_extractor.low_level_feat_layer == 2
    assert cfg.feature_extractor.high_level_feat_layer == 30
    assert "FEATUREEXTRACTOR" in cfg.as_ini()
    assert Config().feature_extractor.high_level_feat_layer == 34


def test_xla_scoped_vmem_knob_roundtrip():
    """TPU compiler knob: INI round-trip + default-off."""
    from gan_sr_wind_field_tpu.config import Config

    cfg = Config.from_ini(LOCAL_INI)
    assert cfg.xla_scoped_vmem_limit_kib == 0  # default: compiler decides
    cfg.xla_scoped_vmem_limit_kib = 65536
    cfg2 = Config.from_ini_string(cfg.as_ini())
    assert cfg2.xla_scoped_vmem_limit_kib == 65536


def test_xla_scoped_vmem_knob_skipped_on_cpu():
    """With the knob set, the GAN's jits must skip the TPU-only compiler
    option on CPU backends (it doesn't exist there) and still run."""
    import numpy as np
    import jax

    from gan_sr_wind_field_tpu.config import Config
    from gan_sr_wind_field_tpu.train.gan import WindFieldGAN

    cfg = Config.from_ini(LOCAL_INI)
    cfg.xla_scoped_vmem_limit_kib = 65536
    cfg.compute_dtype = "float32"
    g = cfg.generator
    g.num_features = 8
    g.num_RRDB = 1
    g.num_RDB_convs = 2
    g.RDB_growth_chan = 4
    g.terrain_number_of_features = 4
    cfg.discriminator.num_features = 4
    cfg.gan_config.enable_slicing = True
    cfg.gan_config.slice_size = 16

    x = np.arange(16, dtype=np.float32) * 150.0
    gan = WindFieldGAN(cfg, x, x)
    rng = np.random.default_rng(0)
    lr_shape, hr_shape = (2, 4, 4, 10, 4), (2, 16, 16, 10, 3)
    state = gan.init_state(jax.random.key(0), lr_shape, hr_shape)
    lr = rng.standard_normal(lr_shape).astype(np.float32) * 0.1
    hr = rng.standard_normal(hr_shape).astype(np.float32) * 0.1
    z = np.cumsum(
        1.0 + rng.random((2, 16, 16, 10, 1)), axis=3
    ).astype(np.float32)
    state, m = gan.train_step(state, lr, hr, z, augment=True)
    assert np.isfinite(float(m["total"]))


# core inner-loop tier: `pytest -m smoke` (VERDICT r4 next 8)
pytestmark = pytest.mark.smoke
