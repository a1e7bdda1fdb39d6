"""int8 trunk quantization (ops/quant_trunk.py + serve integration).

The reference-math mirror in `trunk_reference_amax` is parity-tested
against the fused Pallas trunk (interpret mode — itself oracle-tested
against the flax generator), then the int8 path is bounded against that
mirror, and the serving integration (WindFieldSR.quantize_trunk, alone
and composed with the int8 head) is driven end to end.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gan_sr_wind_field_tpu.config import Config
from gan_sr_wind_field_tpu.ops.quant_trunk import (
    QuantizedTrunk,
    quantize_trunk,
    trunk_int8_apply,
    trunk_reference_amax,
)
from gan_sr_wind_field_tpu.train.gan import WindFieldGAN


def _cfg(num_rrdb=2, num_convs=3):
    cfg = Config()
    cfg.scale = 4
    cfg.compute_dtype = "float32"
    cfg.use_fused_trunk = True
    cfg.gan_config.include_pressure = False
    cfg.gan_config.include_z_channel = True
    cfg.gan_config.number_of_z_layers = 4
    cfg.gan_config.enable_slicing = True
    cfg.gan_config.slice_size = 16
    g = cfg.generator
    g.num_features = 8
    g.num_RRDB = num_rrdb
    g.num_RDB_convs = num_convs
    g.RDB_growth_chan = 4
    g.hr_kern_size = 3
    g.terrain_number_of_features = 4
    cfg.discriminator.num_features = 4
    cfg.training.niter = 10
    return cfg


@pytest.fixture(scope="module")
def setup():
    cfg = _cfg()
    x = np.arange(16, dtype=np.float32) * 150.0
    gan = WindFieldGAN(cfg, x, x)
    state = gan.init_state(
        jax.random.key(0), (2, 4, 4, 4, 4), (2, 16, 16, 4, 3)
    )
    return gan, state.params_G


def _geom(G):
    return dict(
        num_rrdb=G.num_rrdb, num_convs=G.num_rdb_convs,
        lff_kern=G.lff_kern_size, rdb_scale=G.rdb_residual_scaling,
        rrdb_scale=G.rrdb_residual_scaling,
        negative_slope=G.negative_slope,
    )


def test_reference_trunk_matches_fused_interpret(setup, rng):
    """The calibration-path forward must equal the (flax-oracle-tested)
    fused Pallas trunk in interpret mode."""
    from gan_sr_wind_field_tpu.models.fused_apply import _fused_trunk_fn

    gan, params = setup
    G = gan.G
    x = jnp.asarray(
        rng.standard_normal((2, 4, 4, 4, G.num_features)) * 0.5, jnp.float32
    )
    ref = _fused_trunk_fn(G, params, interpret=True)(x)
    got, ax, ac = trunk_reference_amax(params, x, **_geom(G))
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-6
    )
    J = 3 * G.num_rrdb
    K = G.num_rdb_convs - 1
    assert ax.shape == (J, G.num_features)
    assert ac.shape == (J, K, G.rdb_growth_channels)
    assert np.all(np.asarray(ax) >= 0) and np.all(np.asarray(ac) >= 0)


def test_int8_trunk_close_to_reference(setup, rng):
    gan, params = setup
    G = gan.G
    geom = _geom(G)
    x = jnp.asarray(
        rng.standard_normal((2, 4, 4, 4, G.num_features)) * 0.5, jnp.float32
    )
    ref, ax, ac = trunk_reference_amax(params, x, **geom)
    qt = quantize_trunk(params, ax, ac, **geom)
    assert isinstance(qt, QuantizedTrunk)
    for w in qt.wq:
        assert w.dtype == jnp.int8
    got = np.asarray(trunk_int8_apply(qt, x, out_dtype=jnp.float32))
    ref = np.asarray(ref)
    # residual structure keeps accumulated int8 noise small: each RDB's
    # quantized contribution is scaled by 0.2 before joining the ladder
    rel = np.linalg.norm(got - ref) / (np.linalg.norm(ref) + 1e-12)
    assert rel < 0.02, rel
    assert not np.array_equal(got, ref)


def test_int8_trunk_jits(setup, rng):
    gan, params = setup
    G = gan.G
    geom = _geom(G)
    x = jnp.asarray(
        rng.standard_normal((1, 4, 4, 4, G.num_features)), jnp.float32
    )
    _, ax, ac = trunk_reference_amax(params, x, **geom)
    qt = quantize_trunk(params, ax, ac, **geom)
    f = jax.jit(lambda q, v: trunk_int8_apply(q, v, jnp.float32))
    got = np.asarray(f(qt, x))
    ref = np.asarray(trunk_int8_apply(qt, x, jnp.float32))
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)


def _serve_sr():
    from gan_sr_wind_field_tpu.eval.serve import WindFieldSR

    cfg = _cfg()
    x = np.arange(16, dtype=np.float32) * 150.0
    gan = WindFieldGAN(cfg, x, x)
    state = gan.init_state(
        jax.random.key(0), (1, 4, 4, 4, 4), (1, 16, 16, 4, 3)
    )
    return WindFieldSR(gan, state.params_G)


def test_serve_quantize_trunk_end_to_end(rng):
    sr = _serve_sr()
    lr = rng.standard_normal((3, 4, 4, 4, 4)).astype(np.float32) * 0.3
    zt = (np.cumsum(1.0 + rng.random((16, 16, 4, 1)), axis=2) * 10.0).astype(
        np.float32
    )
    exact = sr.upscale(lr[0], zt)

    qt = sr.quantize_trunk(lr)
    assert isinstance(qt, QuantizedTrunk)
    quant = sr.upscale(lr[0], zt)
    assert quant.shape == exact.shape == (16, 16, 4, 3)
    assert np.isfinite(quant).all()
    denom = np.linalg.norm(exact) + 1e-12
    rel = np.linalg.norm(quant - exact) / denom
    assert rel < 0.03, rel
    assert not np.array_equal(quant, exact)

    # composes with the int8 head: the whole serving FLOPs majority int8
    sr.quantize(lr)
    both = sr.upscale(lr[0], zt)
    rel_both = np.linalg.norm(both - exact) / denom
    assert rel_both < 0.04, rel_both

    sr.dequantize()
    back = sr.upscale(lr[0], zt)
    np.testing.assert_allclose(back, exact, rtol=1e-6, atol=1e-6)


def test_serve_quantized_trunk_tiled(rng):
    sr = _serve_sr()
    lr = rng.standard_normal((8, 8, 4, 4)).astype(np.float32) * 0.3
    zt = (np.cumsum(1.0 + rng.random((32, 32, 4, 1)), axis=2) * 10.0).astype(
        np.float32
    )
    exact = sr.upscale_tiled(lr, zt, tile=4, overlap=2, batch=2)
    sr.quantize_trunk(lr[None, :4, :4])
    quant = sr.upscale_tiled(lr, zt, tile=4, overlap=2, batch=2)
    assert quant.shape == exact.shape
    rel = np.linalg.norm(quant - exact) / (np.linalg.norm(exact) + 1e-12)
    assert rel < 0.03, rel


def test_quantize_trunk_rejects_non_fused(rng):
    from gan_sr_wind_field_tpu.eval.serve import WindFieldSR

    cfg = _cfg()
    cfg.use_fused_trunk = False
    x = np.arange(16, dtype=np.float32) * 150.0
    gan = WindFieldGAN(cfg, x, x)
    state = gan.init_state(
        jax.random.key(0), (1, 4, 4, 4, 4), (1, 16, 16, 4, 3)
    )
    sr = WindFieldSR(gan, state.params_G)
    lr = rng.standard_normal((2, 4, 4, 4, 4)).astype(np.float32)
    with pytest.raises(ValueError, match="fused-trunk"):
        sr.quantize_trunk(lr)
