"""Serving API tests: checkpoint loading + tiled inference blending."""

import numpy as np

import jax

from gan_sr_wind_field_tpu.eval.serve import WindFieldSR, _cosine_window
from gan_sr_wind_field_tpu.train import checkpoint as ckpt
from gan_sr_wind_field_tpu.train.gan import WindFieldGAN
from test_train_step import tiny_cfg


def _make_sr():
    cfg = tiny_cfg()
    cfg.generator.dropout_probability = 0.0
    x = np.arange(32, dtype=np.float32) * 150
    gan = WindFieldGAN(cfg, x, x)
    state = gan.init_state(jax.random.key(0), (1, 4, 4, 4, 4), (1, 16, 16, 4, 3))
    return WindFieldSR(gan, state.params_G), cfg


def test_cosine_window_positive():
    w = _cosine_window(16)
    assert w.min() > 0 and w.max() <= 1.0


def test_upscale_shapes(rng):
    sr, cfg = _make_sr()
    lr = rng.standard_normal((4, 4, 4, 4)).astype(np.float32)
    zt = rng.standard_normal((16, 16, 4, 1)).astype(np.float32)
    out = sr.upscale(lr, zt)
    assert out.shape == (16, 16, 4, 3)


def test_tiled_equals_direct_when_tile_covers(rng):
    sr, _ = _make_sr()
    lr = rng.standard_normal((4, 4, 4, 4)).astype(np.float32)
    zt = rng.standard_normal((16, 16, 4, 1)).astype(np.float32)
    direct = sr.upscale(lr, zt)
    tiled = sr.upscale_tiled(lr, zt, tile=8, overlap=2)
    np.testing.assert_allclose(tiled, direct, rtol=1e-5, atol=1e-6)


def test_tiled_large_volume_close_to_direct(rng):
    sr, _ = _make_sr()
    lr = rng.standard_normal((8, 8, 4, 4)).astype(np.float32) * 0.1
    zt = rng.standard_normal((32, 32, 4, 1)).astype(np.float32)
    direct = sr.upscale(lr, zt)
    tiled = sr.upscale_tiled(lr, zt, tile=4, overlap=2)
    assert tiled.shape == direct.shape
    # small tiles can't match a global receptive field exactly, but blended
    # output must stay close and seam-free
    err = np.abs(tiled - direct)
    assert np.median(err) < 0.25 * np.std(np.asarray(direct))


def test_mesh_sharded_upscale_matches_single(rng):
    """Full-volume inference sharded over the x axis of an 8-way spatial
    mesh == single-device result (GSPMD conv halo exchange)."""
    from gan_sr_wind_field_tpu.parallel import make_mesh

    sr, _ = _make_sr()
    lr = rng.standard_normal((8, 8, 4, 4)).astype(np.float32) * 0.1
    zt = rng.standard_normal((32, 32, 4, 1)).astype(np.float32)
    direct = sr.upscale(lr, zt)

    sr_mesh = WindFieldSR(sr.gan, sr.params_G, mesh=make_mesh(1, 1, 8))
    sharded = sr_mesh.upscale(lr, zt)
    np.testing.assert_allclose(sharded, direct, rtol=2e-4, atol=1e-5)


def test_from_checkpoint(tmp_path, rng):
    cfg = tiny_cfg()
    x = np.arange(16, dtype=np.float32) * 150
    gan = WindFieldGAN(cfg, x, x)
    state = gan.init_state(jax.random.key(0), (2, 4, 4, 4, 4), (2, 16, 16, 4, 3))
    path = ckpt.save_checkpoint(str(tmp_path), state)

    sr = WindFieldSR.from_checkpoint(cfg, path, x, x)
    lr = rng.standard_normal((4, 4, 4, 4)).astype(np.float32)
    zt = rng.standard_normal((16, 16, 4, 1)).astype(np.float32)
    out = sr.upscale(lr, zt)
    assert np.all(np.isfinite(out))


def test_tiled_batched_matches_batch1(rng):
    """Tile batching is a pure throughput change: batch=4 (9 tiles → a
    padded, masked final chunk) reproduces batch=1 tiling."""
    sr, _ = _make_sr()
    lr = rng.standard_normal((8, 8, 4, 4)).astype(np.float32) * 0.1
    zt = rng.standard_normal((32, 32, 4, 1)).astype(np.float32)
    a = sr.upscale_tiled(lr, zt, tile=4, overlap=2, batch=1)
    b = sr.upscale_tiled(lr, zt, tile=4, overlap=2, batch=4)
    np.testing.assert_allclose(b, a, rtol=1e-5, atol=1e-6)


def test_tiled_device_pipeline_matches_host_loop(rng):
    """The device-resident tiled pipeline (one upload, on-device slicing +
    blending, one download) equals the host-loop fallback used on meshes."""
    from gan_sr_wind_field_tpu.parallel import make_mesh

    sr, _ = _make_sr()
    lr = rng.standard_normal((8, 8, 4, 4)).astype(np.float32) * 0.1
    zt = rng.standard_normal((32, 32, 4, 1)).astype(np.float32)
    dev = sr.upscale_tiled(lr, zt, tile=4, overlap=2, batch=4)

    sr_host = WindFieldSR(sr.gan, sr.params_G, mesh=make_mesh(1, 1))
    host = sr_host.upscale_tiled(lr, zt, tile=4, overlap=2, batch=4)
    np.testing.assert_allclose(dev, host, rtol=1e-5, atol=1e-6)


def test_dp_mesh_batched_upscale_matches_single(rng):
    """Batched serving over a dp-only 8-way mesh (fused trunk under
    shard_map over 'data', volume_sharding batch placement) == the
    single-device result — the multi-chip serving scale-out path."""
    from gan_sr_wind_field_tpu.parallel import make_mesh
    from gan_sr_wind_field_tpu.train.gan import WindFieldGAN
    from test_train_step import tiny_cfg

    cfg = tiny_cfg()
    cfg.generator.dropout_probability = 0.0
    x = np.arange(32, dtype=np.float32) * 150
    gan = WindFieldGAN(cfg, x, x)
    state = gan.init_state(
        jax.random.key(0), (8, 4, 4, 4, 4), (8, 16, 16, 4, 3)
    )
    lr = rng.standard_normal((8, 4, 4, 4, 4)).astype(np.float32) * 0.1
    zt = rng.standard_normal((8, 16, 16, 4, 1)).astype(np.float32)
    direct = WindFieldSR(gan, state.params_G).upscale(lr, zt)

    gan_dp = WindFieldGAN(cfg, x, x, mesh=make_mesh(8, 1))
    sharded = WindFieldSR(gan_dp, state.params_G,
                          mesh=gan_dp.mesh).upscale(lr, zt)
    assert sharded.shape == direct.shape == (8, 16, 16, 4, 3)
    np.testing.assert_allclose(sharded, direct, rtol=2e-4, atol=1e-5)


# ------------------------------------------------- physical-units serving
def _raw_fields(rng, X=16, zl=4):
    z = (np.cumsum(1.0 + rng.random((X, X, zl)), axis=2) * 30 + 60).astype(
        np.float32
    )
    zag = (rng.random((X, X, zl)) * 250).astype(np.float32)
    u, v, w = (
        (rng.standard_normal((X, X, zl)) * 5).astype(np.float32)
        for _ in range(3)
    )
    p = (rng.random((X, X, zl)) * 1e4 + 9.2e4).astype(np.float32)
    return z, zag, u, v, w, p


def _stats():
    from gan_sr_wind_field_tpu.data.transform import NormStats

    return NormStats(z_min=50.0, z_max=900.0, z_above_ground_max=300.0,
                     uvw_max=21.5, p_min=9.0e4, p_max=1.05e5)


def test_physical_inputs_match_pipeline_normalization(rng):
    """physical_to_model_inputs must reproduce reformat_sample's LR
    channel stack exactly (the training pipeline is the oracle) — all
    channel branches (pressure, z, z_above_ground+z_relative)."""
    from gan_sr_wind_field_tpu.data.transform import (
        physical_to_model_inputs,
        reformat_sample,
    )

    z, zag, u, v, w, p = _raw_fields(rng)
    stats = _stats()
    for inc_p, inc_z, inc_zag in [
        (False, True, False), (True, True, True), (False, False, False),
    ]:
        lr_ref, _hr, Z_ref = reformat_sample(
            z, zag, u, v, w, p, stats, coarseness_factor=4,
            include_pressure=inc_p, include_z_channel=inc_z,
            include_above_ground_channel=inc_zag,
        )
        lr_uvw_raw = np.stack([u, v, w], -1)[::4, ::4]
        lr_got, zt_got = physical_to_model_inputs(
            lr_uvw_raw, z, stats, 4,
            include_pressure=inc_p, include_z_channel=inc_z,
            include_above_ground_channel=inc_zag,
            pressure=p[::4, ::4], z_above_ground=zag,
        )
        np.testing.assert_allclose(lr_got, lr_ref, rtol=1e-6, atol=1e-6)
        np.testing.assert_array_equal(zt_got, Z_ref)


def test_upscale_physical_roundtrip(rng):
    """upscale_physical == normalized upscale on the pipeline-built LR,
    scaled back to m/s."""
    sr, cfg = _make_sr()
    from gan_sr_wind_field_tpu.data.transform import reformat_sample

    z, zag, u, v, w, p = _raw_fields(rng)
    stats = _stats()
    g = cfg.gan_config
    lr_ref, _hr, Z_ref = reformat_sample(
        z, zag, u, v, w, p, stats, coarseness_factor=4,
        include_pressure=g.include_pressure,
        include_z_channel=g.include_z_channel,
        include_above_ground_channel=g.include_above_ground_channel,
    )
    sr.norm_stats = stats
    lr_uvw_raw = np.stack([u, v, w], -1)[::4, ::4]
    got = sr.upscale_physical(lr_uvw_raw, z)
    want = sr.upscale(lr_ref, Z_ref) * stats.uvw_max
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_upscale_physical_requires_stats(rng):
    import pytest

    sr, _ = _make_sr()
    z, zag, u, v, w, p = _raw_fields(rng)
    with pytest.raises(ValueError, match="norm_stats"):
        sr.upscale_physical(np.stack([u, v, w], -1)[::4, ::4], z)


def test_tiled_one_dim_smaller_than_tile(rng):
    """A volume narrower than the tile in ONE dim must tile cleanly (the
    tile clamps to the volume so origins stay >= 0) instead of producing
    negative dynamic-slice origins."""
    sr, _ = _make_sr()
    lr = rng.standard_normal((8, 3, 4, 4)).astype(np.float32) * 0.1
    zt = rng.standard_normal((32, 12, 4, 1)).astype(np.float32)
    direct = sr.upscale(lr, zt)
    tiled = sr.upscale_tiled(lr, zt, tile=4, overlap=2)
    assert tiled.shape == direct.shape
    err = np.abs(tiled - direct)
    assert np.all(np.isfinite(tiled))
    assert np.median(err) < 0.25 * np.std(np.asarray(direct))
    # an overlap that no longer fits the clamped tile degrades, not crashes
    tiled2 = sr.upscale_tiled(lr, zt, tile=4, overlap=3)
    assert tiled2.shape == direct.shape and np.all(np.isfinite(tiled2))


def test_from_checkpoint_prefers_ema(tmp_path, rng):
    """Deployment weights are the EMA slot when the checkpoint carries one
    (same preference as run.py --use/--export/--serve), so interp/serving
    built through from_checkpoint matches direct deployment."""
    from test_train_step import make_batch

    cfg = tiny_cfg(g_ema_decay=0.9)
    x = np.arange(16, dtype=np.float32) * 150
    gan = WindFieldGAN(cfg, x, x)
    state = gan.init_state(
        jax.random.key(0), (2, 4, 4, 4, 4), (2, 16, 16, 4, 3)
    )
    lr, hr, z = make_batch(rng)
    for _ in range(2):  # EMA and live weights diverge
        state, _ = gan.train_step(state, lr, hr, z)
    path = ckpt.save_checkpoint(str(tmp_path), state)

    sr = WindFieldSR.from_checkpoint(cfg, path, x, x)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)
        ),
        sr.params_G, state.params_G_ema,
    )
