"""jax.export deployment artifact: round-trip, batch polymorphism, format."""

import numpy as np

import jax
import pytest

from gan_sr_wind_field_tpu.eval.export import (
    ExportedSR,
    export_generator,
    load_exported,
)
from gan_sr_wind_field_tpu.train.gan import WindFieldGAN
from test_train_step import tiny_cfg


def _make_gan():
    cfg = tiny_cfg()
    cfg.generator.dropout_probability = 0.0
    x = np.arange(16, dtype=np.float32) * 150
    gan = WindFieldGAN(cfg, x, x)
    state = gan.init_state(
        jax.random.key(0), (1, 4, 4, 4, 4), (1, 16, 16, 4, 3)
    )
    return gan, state.params_G


def test_export_roundtrip_matches_generate(tmp_path, rng):
    gan, params_G = _make_gan()
    path = str(tmp_path / "generator.wsrx")
    header = export_generator(gan, params_G, path)
    assert header["scale"] == 4 and header["batch_polymorphic"]

    sr = load_exported(path)
    assert isinstance(sr, ExportedSR)
    lr = rng.standard_normal((4, 4, 4, 4)).astype(np.float32) * 0.1
    zt = rng.standard_normal((16, 16, 4, 1)).astype(np.float32)
    got = sr.upscale(lr, zt)
    want = np.asarray(gan.generate(params_G, lr[None], zt[None]))[0]
    assert got.shape == (16, 16, 4, 3)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-5)


def test_export_batch_polymorphic(tmp_path, rng):
    """One artifact serves several batch sizes (symbolic batch dim)."""
    gan, params_G = _make_gan()
    path = str(tmp_path / "generator.wsrx")
    export_generator(gan, params_G, path)
    sr = load_exported(path)
    for b in (1, 3):
        lr = rng.standard_normal((b, 4, 4, 4, 4)).astype(np.float32) * 0.1
        zt = rng.standard_normal((b, 16, 16, 4, 1)).astype(np.float32)
        got = sr.upscale(lr, zt)
        want = np.asarray(gan.generate(params_G, lr, zt))
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-5)


def test_export_static_batch_rejects_mismatch(tmp_path, rng):
    gan, params_G = _make_gan()
    path = str(tmp_path / "generator_static.wsrx")
    header = export_generator(gan, params_G, path, batch_polymorphic=False)
    assert header["lr_shape"][0] == 1
    sr = load_exported(path)
    lr = rng.standard_normal((2, 4, 4, 4, 4)).astype(np.float32)
    zt = rng.standard_normal((2, 16, 16, 4, 1)).astype(np.float32)
    with pytest.raises(ValueError, match="static batch"):
        sr.upscale(lr, zt)


def test_export_bad_magic(tmp_path):
    p = tmp_path / "junk.wsrx"
    p.write_bytes(b"NOPE" + b"\x00" * 16)
    with pytest.raises(ValueError, match="not a WSRX artifact"):
        load_exported(str(p))


def test_export_carries_norm_stats(tmp_path):
    """The artifact header bakes in the training cache's normalization
    factors so consumers can recover physical units (m/s) from the
    model's normalized-space output."""
    from gan_sr_wind_field_tpu.data.transform import NormStats

    gan, params_G = _make_gan()
    stats = NormStats(
        z_min=12.0, z_max=1500.0, z_above_ground_max=400.0,
        uvw_max=25.25, p_min=9.9e4, p_max=1.03e5,
    )
    path = str(tmp_path / "gen_stats.wsrx")
    header = export_generator(gan, params_G, path, norm_stats=stats)
    assert header["norm_stats"]["uvw_max"] == 25.25

    sr = load_exported(path)
    assert sr.norm_stats["uvw_max"] == 25.25
    assert sr.norm_stats["z_min"] == 12.0


def test_exported_upscale_physical(tmp_path, rng):
    """Artifact-level physical-units serving: channel layout + norm_stats
    from the header reproduce WindFieldSR.upscale_physical semantics."""
    from gan_sr_wind_field_tpu.data.transform import NormStats

    gan, params_G = _make_gan()
    stats = NormStats(z_min=50.0, z_max=900.0, z_above_ground_max=300.0,
                      uvw_max=21.5, p_min=9.0e4, p_max=1.05e5)
    path = str(tmp_path / "gen_phys.wsrx")
    header = export_generator(gan, params_G, path, norm_stats=stats)
    assert header["lr_channels"] == ["u", "v", "w", "z"]

    sr = load_exported(path)
    z = (np.cumsum(1.0 + rng.random((16, 16, 4)), axis=2) * 30 + 60).astype(
        np.float32
    )
    lr_uvw = (rng.standard_normal((4, 4, 4, 3)) * 5).astype(np.float32)
    got = sr.upscale_physical(lr_uvw, z)
    assert got.shape == (16, 16, 4, 3)

    # oracle: hand-built normalized inputs through the plain artifact call
    lr = np.concatenate(
        [lr_uvw / stats.uvw_max,
         ((z[::4, ::4] - stats.z_min)
          / (stats.z_max - stats.z_min))[..., None]], axis=-1,
    ).astype(np.float32)
    want = sr.upscale(lr, z[..., None]) * stats.uvw_max
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_exported_upscale_physical_requires_stats(tmp_path, rng):
    gan, params_G = _make_gan()
    path = str(tmp_path / "gen_nostats.wsrx")
    export_generator(gan, params_G, path)
    sr = load_exported(path)
    with pytest.raises(ValueError, match="norm_stats"):
        sr.upscale_physical(
            np.zeros((4, 4, 4, 3), np.float32), np.zeros((16, 16, 4))
        )
