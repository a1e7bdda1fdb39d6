"""Config-space smoke grid: edge combinations of model-shape knobs must
build and take one G and one D train step with finite losses.

The reference crashes on several config corners (e.g. its horizontal-conv
init, its missing-Z --use path); this grid guards ours against that class
of bug — the pick_chunk k=1 crash fixed in round 2 is exactly what it
would have caught. Training-*option* variants (gan types, labels, noise)
live in test_train_variants.py; this file varies the model geometry:
channel makeup, scale, kernel sizes, norm/layer modes.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from test_train_step import tiny_cfg

from gan_sr_wind_field_tpu.train.gan import WindFieldGAN

SIZE, ZL = 16, 4


def _batch(rng, scale, n_lr_ch, n=2):
    hr = rng.standard_normal((n, SIZE, SIZE, ZL, 3)).astype(np.float32) * 0.3
    lr = hr[:, ::scale, ::scale]
    if n_lr_ch > 3:
        extra = rng.random(
            (n, SIZE // scale, SIZE // scale, ZL, n_lr_ch - 3)
        ).astype(np.float32)
        lr = np.concatenate([lr, extra], axis=-1)
    z = np.cumsum(
        1.0 + rng.random((n, SIZE, SIZE, ZL, 1)).astype(np.float32), axis=3
    ) * 10
    return jnp.asarray(lr), jnp.asarray(hr), jnp.asarray(z)


CASES = {
    # minimal channels: uvw only (reference local config with all extra
    # channels off), smallest scale, 1x1x1 HR head kernel
    "min_channels_scale2_k1": dict(
        scale=2, include_pressure=False, include_z_channel=False,
        hr_kern_size=1,
    ),
    # every optional channel on (6-ch LR), 8x, 3x3x3 head
    "all_channels_scale8": dict(
        scale=8, include_pressure=True, include_z_channel=True,
        include_above_ground_channel=True, hr_kern_size=3,
    ),
    # wide LFF fusion kernel (lff_kern_size=3 disables the fused trunk)
    "lff3": dict(scale=4, lff_kern_size=3),
    # per-z-window unshared conv weights + plain-ReLU activations wired
    # from gan_config.conv_mode / act_type (reference
    # wind_field_GAN_3D.py:107-110)
    "horizontal_relu": dict(
        scale=4, conv_mode="horizontal_3D", act_type="relu",
    ),
    # dropout active in the HR head during training
    "dropout_head": dict(scale=4, dropout_probability=0.3, hr_kern_size=3),
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_model_geometry_smoke(name, rng):
    c = CASES[name]
    cfg = tiny_cfg()
    cfg.scale = c["scale"]
    g = cfg.gan_config
    g.include_pressure = c.get("include_pressure", False)
    g.include_z_channel = c.get("include_z_channel", True)
    g.include_above_ground_channel = c.get(
        "include_above_ground_channel", False
    )
    g.conv_mode = c.get("conv_mode", "3D")
    gen = cfg.generator
    gen.hr_kern_size = c.get("hr_kern_size", 3)
    gen.lff_kern_size = c.get("lff_kern_size", 1)
    gen.dropout_probability = c.get("dropout_probability", 0.1)
    gen.act_type = c.get("act_type", "leakyrelu")

    n_lr_ch = cfg.lr_num_channels
    x = np.arange(SIZE, dtype=np.float32) * 150
    y = np.arange(SIZE, dtype=np.float32) * 150
    gan = WindFieldGAN(cfg, x, y)
    assert gan.G.conv_mode == g.conv_mode  # wiring, not just acceptance
    if c.get("act_type") == "relu":
        assert gan.G.negative_slope == 0.0
    lr, hr, z = _batch(np.random.default_rng(0), c["scale"], n_lr_ch)
    state = gan.init_state(jax.random.key(0), lr.shape, hr.shape)

    # period=2, ratio=1: it 1 is a G step, it 2 a D step
    state, m1 = gan.train_step(state, lr, hr, z)
    assert float(m1["is_g_step"]) == 1.0
    assert np.isfinite(float(m1["total"])), name
    state, m2 = gan.train_step(state, lr, hr, z)
    assert float(m2["is_g_step"]) == 0.0
    assert np.isfinite(float(m2["D_train_loss"])), name

    # eval-mode inference keeps the HR geometry
    sr = gan.generate(state.params_G, lr, z)
    assert sr.shape == hr.shape, name
    assert np.all(np.isfinite(np.asarray(sr))), name
