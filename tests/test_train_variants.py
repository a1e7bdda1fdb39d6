"""Train-step variant coverage: every gan_type / label / noise / loss-mode
switch the reference supports (wind_field_GAN_3D.py:176-205, 627-678)."""

import numpy as np
import pytest

import jax

from gan_sr_wind_field_tpu.train.gan import WindFieldGAN
from test_train_step import make_batch, tiny_cfg


def _run_steps(cfg, rng, n=3):
    x = np.arange(16, dtype=np.float32) * 150
    gan = WindFieldGAN(cfg, x, x)
    state = gan.init_state(
        jax.random.key(0), (2, 4, 4, 4, 4), (2, 16, 16, 4, 3)
    )
    lr, hr, z = make_batch(rng)
    metrics = []
    for _ in range(n):
        state, m = gan.train_step(state, lr, hr, z)
        metrics.append(m)
    return state, metrics


@pytest.mark.parametrize("gan_type", ["relativistic", "relativisticavg"])
def test_gan_types(rng, gan_type):
    cfg = tiny_cfg(gan_type=gan_type)
    _, ms = _run_steps(cfg, rng)
    assert np.isfinite(float(ms[0]["total"]))
    assert np.isfinite(float(ms[2]["D_train_loss"]))


def test_unknown_gan_type_raises():
    cfg = tiny_cfg(gan_type="dcgan")
    x = np.arange(16, dtype=np.float32)
    with pytest.raises(NotImplementedError):
        WindFieldGAN(cfg, x, x)


def test_l2_pixel_criterion(rng):
    cfg = tiny_cfg(pixel_criterion="l2")
    _, ms = _run_steps(cfg, rng)
    assert float(ms[0]["pix"]) > 0


def test_no_pixel_criterion(rng):
    cfg = tiny_cfg(pixel_criterion="none")
    _, ms = _run_steps(cfg, rng)
    assert float(ms[0]["pix"]) == 0.0


def test_noisy_labels_and_flip(rng):
    cfg = tiny_cfg(use_noisy_labels=True, flip_labels=True,
                   use_one_sided_label_smoothing=False)
    _, ms = _run_steps(cfg, rng)
    assert np.isfinite(float(ms[0]["total"]))


def test_flipped_smoothing_ramp(rng):
    cfg = tiny_cfg(flip_labels=True, use_one_sided_label_smoothing=True)
    _, ms = _run_steps(cfg, rng)
    assert np.isfinite(float(ms[0]["total"]))


def test_feature_d_extractor(rng):
    cfg = tiny_cfg(feature_D_update_period=2, feature_D_loss_weight=0.1)
    cfg.gan_config.use_D_feature_extractor_cost = True
    state, ms = _run_steps(cfg, rng, n=3)
    assert float(ms[0]["feature_D"]) >= 0
    assert np.isfinite(float(ms[0]["total"]))
    # frozen copy exists and has D's structure
    assert jax.tree.structure(state.params_D_frozen) == jax.tree.structure(
        state.params_D
    )


def test_no_instance_noise_deterministic_labels(rng):
    cfg = tiny_cfg(use_instance_noise=False, use_noisy_labels=False)
    _, ms = _run_steps(cfg, rng)
    assert np.isfinite(float(ms[0]["total"]))


def test_pallas_stencil_training_path_matches_xla(rng):
    # same batch, same state → identical losses whichever stencil backend
    cfg_x = tiny_cfg(use_instance_noise=False)
    cfg_x.generator.dropout_probability = 0.0
    cfg_p = tiny_cfg(use_instance_noise=False)
    cfg_p.generator.dropout_probability = 0.0
    cfg_p.use_pallas_stencil = True

    x = np.arange(16, dtype=np.float32) * 150
    lr, hr, z = make_batch(rng)
    outs = []
    for cfg in (cfg_x, cfg_p):
        gan = WindFieldGAN(cfg, x, x)
        state = gan.init_state(
            jax.random.key(0), (2, 4, 4, 4, 4), (2, 16, 16, 4, 3)
        )
        state, m = gan.train_step(state, lr, hr, z)
        outs.append({k: float(v) for k, v in m.items()})
    for k in ("total", "xy_gradient", "z_gradient", "divergence"):
        np.testing.assert_allclose(outs[0][k], outs[1][k], rtol=1e-4), k
