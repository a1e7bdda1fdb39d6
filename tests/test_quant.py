"""int8 serving-head quantization (ops/quant.py + serve integration).

The scheme folds per-input-channel activation scales into the kernel
(exact reassociation of the c_in contraction) and quantizes the folded
kernel per output channel, so with integer-valued inputs/weights whose
scales are exactly 1 the int8 path must reproduce the f32 conv EXACTLY —
that is the hard oracle here; random-data cases bound the rounding noise.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gan_sr_wind_field_tpu.ops.quant import (
    QuantizedHead,
    conv3d_int8,
    fold_quantize_kernel,
    head_input_amax,
    quantize_act,
    quantize_split_head,
    scales_from_amax,
    split_head_conv_int8,
)

_DN = ("NDHWC", "DHWIO", "NDHWC")


def _conv_f32(x, w, pad):
    return jax.lax.conv_general_dilated(
        x.astype(jnp.float32), w.astype(jnp.float32),
        window_strides=(1, 1, 1), padding=[(pad, pad)] * 3,
        dimension_numbers=_DN,
    )


def test_int8_conv_exact_on_integer_data(rng):
    # integer x in [-127,127] with s_in == 1 and integer w with per-channel
    # amax == 127 → zero quantization error anywhere in the pipeline
    x = jnp.asarray(
        rng.integers(-127, 128, (2, 5, 5, 4, 6)), jnp.float32
    )
    w = rng.integers(-126, 127, (3, 3, 3, 6, 8)).astype(np.float32)
    w[0, 0, 0, 0, :] = 127.0  # pin per-out-channel amax to 127
    w = jnp.asarray(w)
    s_in = jnp.ones(6, jnp.float32)

    wq, s_out = fold_quantize_kernel(w, s_in)
    np.testing.assert_array_equal(np.asarray(s_out), np.ones(8))
    xq = quantize_act(x, s_in)
    y = conv3d_int8(xq, wq, 1).astype(jnp.float32) * s_out
    np.testing.assert_array_equal(
        np.asarray(y), np.asarray(_conv_f32(x, w, 1))
    )


def test_fold_is_exact_reassociation(rng):
    # conv(x, w) == conv(x / s, w * s[ci]) for any positive per-channel s —
    # checked in f32 (no quantization): the folding identity itself
    x = jnp.asarray(rng.standard_normal((1, 4, 4, 4, 5)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 3, 5, 7)), jnp.float32)
    s = jnp.asarray(rng.uniform(0.1, 3.0, 5), jnp.float32)
    ref = _conv_f32(x, w, 1)
    folded = _conv_f32(x / s, w * s[None, None, None, :, None], 1)
    np.testing.assert_allclose(
        np.asarray(folded), np.asarray(ref), rtol=2e-5, atol=2e-5
    )


@pytest.mark.parametrize("lane", [128, 8])
def test_split_head_int8_matches_f32_conv(rng, lane):
    # lane=128 → unsplit (cm == cout); lane=8 → 8-out main + 4-out
    # tap-stacked remainder (both int8 code paths)
    x = jnp.asarray(
        rng.standard_normal((2, 6, 6, 4, 6)) * 2.0, jnp.float32
    )
    w = jnp.asarray(rng.standard_normal((3, 3, 3, 6, 12)) * 0.1, jnp.float32)
    amax = head_input_amax(x)
    qh = quantize_split_head(w, scales_from_amax(amax), lane=lane)
    assert isinstance(qh, QuantizedHead)
    assert (qh.wq_rem is None) == (lane == 128)

    got = np.asarray(
        split_head_conv_int8(x, qh, 1, out_dtype=jnp.float32)
    )
    ref = np.asarray(_conv_f32(x, w, 1))
    # per-channel int8 on both operands: relative RMS error ~1% for
    # gaussian data under abs-max calibration (amax/rms ≈ 3.5 here)
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert rel < 0.015, rel


def test_quantized_head_jit_static_geometry(rng):
    x = jnp.asarray(rng.standard_normal((1, 4, 4, 4, 6)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 3, 6, 12)) * 0.1, jnp.float32)
    qh = quantize_split_head(w, scales_from_amax(head_input_amax(x)), lane=8)
    f = jax.jit(lambda q, v: split_head_conv_int8(v, q, 1, jnp.float32))
    got = np.asarray(f(qh, x))
    ref = np.asarray(split_head_conv_int8(x, qh, 1, jnp.float32))
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)


def _tiny_cfg():
    from gan_sr_wind_field_tpu.config import Config

    cfg = Config()
    cfg.scale = 4
    cfg.use_fused_trunk = True
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
    cfg.discriminator.num_features = 4
    cfg.training.niter = 10
    return cfg


def _serve_sr():
    from gan_sr_wind_field_tpu.eval.serve import WindFieldSR
    from gan_sr_wind_field_tpu.train.gan import WindFieldGAN

    cfg = _tiny_cfg()
    x = np.arange(16, dtype=np.float32) * 150.0
    gan = WindFieldGAN(cfg, x, x)
    state = gan.init_state(
        jax.random.key(0), (1, 4, 4, 4, 4), (1, 16, 16, 4, 3)
    )
    return WindFieldSR(gan, state.params_G)


def test_serve_quantize_end_to_end(rng):
    sr = _serve_sr()
    lr = rng.standard_normal((3, 4, 4, 4, 4)).astype(np.float32) * 0.3
    zt = (np.cumsum(1.0 + rng.random((16, 16, 4, 1)), axis=2) * 10.0).astype(
        np.float32
    )
    exact = sr.upscale(lr[0], zt)

    qh = sr.quantize(lr)
    assert isinstance(qh, QuantizedHead)
    quant = sr.upscale(lr[0], zt)
    assert quant.shape == exact.shape == (16, 16, 4, 3)
    assert np.isfinite(quant).all()
    # int8 rounding on ONE conv of the head: output stays close to exact
    denom = np.linalg.norm(exact) + 1e-12
    rel = np.linalg.norm(quant - exact) / denom
    assert rel < 0.02, rel
    # and genuinely different buffers (the quantized path really ran)
    assert not np.array_equal(quant, exact)

    sr.dequantize()
    back = sr.upscale(lr[0], zt)
    np.testing.assert_allclose(back, exact, rtol=1e-6, atol=1e-6)


def test_serve_quantized_tiled(rng):
    sr = _serve_sr()
    lr = rng.standard_normal((8, 8, 4, 4)).astype(np.float32) * 0.3
    zt = (np.cumsum(1.0 + rng.random((32, 32, 4, 1)), axis=2) * 10.0).astype(
        np.float32
    )
    exact = sr.upscale_tiled(lr, zt, tile=4, overlap=2, batch=2)
    sr.quantize(lr[None, :4, :4])
    quant = sr.upscale_tiled(lr, zt, tile=4, overlap=2, batch=2)
    assert quant.shape == exact.shape
    rel = np.linalg.norm(quant - exact) / (np.linalg.norm(exact) + 1e-12)
    assert rel < 0.02, rel


def test_quantize_rejects_non_fused_trunk(rng):
    """quantize() must check the fused-trunk precondition UP FRONT (the
    calibration probe itself runs through the fused trunk) instead of
    calibrating happily and failing on the next upscale()."""
    from gan_sr_wind_field_tpu.eval.serve import WindFieldSR
    from gan_sr_wind_field_tpu.train.gan import WindFieldGAN

    cfg = _tiny_cfg()
    cfg.use_fused_trunk = False
    x = np.arange(16, dtype=np.float32) * 150.0
    gan = WindFieldGAN(cfg, x, x)
    state = gan.init_state(
        jax.random.key(0), (1, 4, 4, 4, 4), (1, 16, 16, 4, 3)
    )
    sr = WindFieldSR(gan, state.params_G)
    lr = rng.standard_normal((2, 4, 4, 4, 4)).astype(np.float32)
    with pytest.raises(ValueError, match="fused-trunk"):
        sr.quantize(lr)


def test_quantize_rejects_train_mode(rng):
    from gan_sr_wind_field_tpu.models.fused_apply import generator_forward

    sr = _serve_sr()
    G = sr.gan._G_nograd
    w = jnp.asarray(
        rng.standard_normal((3, 3, 3, 8, 12)) * 0.1, jnp.float32
    )
    qh = quantize_split_head(w, jnp.ones(8))
    with pytest.raises(ValueError):
        generator_forward(
            G, sr.params_G, jnp.zeros((1, 4, 4, 4, 4)),
            jnp.zeros((1, 16, 16, 4, 1)), lambda x: x,
            train=True, dropout_key=jax.random.key(0), qhead=qh,
        )
