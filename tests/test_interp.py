"""Network interpolation (eval/interp.py): param blending + CLI artifact.

Oracle: blend_params is exact linear interpolation leaf-wise; alpha
endpoints reproduce the source models' outputs bit-for-bit.
"""

import numpy as np
import pytest

import jax

from gan_sr_wind_field_tpu.eval.interp import blend_params, main
from gan_sr_wind_field_tpu.train import checkpoint as ckpt
from gan_sr_wind_field_tpu.train.gan import WindFieldGAN
from test_train_step import tiny_cfg


def _two_states(tmp_path):
    cfg = tiny_cfg()
    cfg.generator.dropout_probability = 0.0
    x = np.arange(16, dtype=np.float32) * 150
    gan = WindFieldGAN(cfg, x, x)
    s_a = gan.init_state(jax.random.key(1), (1, 4, 4, 4, 4), (1, 16, 16, 4, 3))
    s_b = gan.init_state(jax.random.key(2), (1, 4, 4, 4, 4), (1, 16, 16, 4, 3))
    path_a = ckpt.save_checkpoint(str(tmp_path / "a"), s_a)
    path_b = ckpt.save_checkpoint(str(tmp_path / "b"), s_b)
    return cfg, gan, s_a, s_b, path_a, path_b


def test_blend_params_linear():
    a = {"k": np.full((3,), 2.0, np.float32),
         "n": {"w": np.full((2, 2), 4.0, np.float32)}}
    b = {"k": np.full((3,), 6.0, np.float32),
         "n": {"w": np.full((2, 2), 0.0, np.float32)}}
    out = blend_params(a, b, 0.25)  # 0.25·a + 0.75·b
    np.testing.assert_allclose(out["k"], 0.25 * 2.0 + 0.75 * 6.0)
    np.testing.assert_allclose(out["n"]["w"], 0.25 * 4.0)


def test_blend_params_validates():
    a = {"k": np.zeros(3, np.float32)}
    with pytest.raises(ValueError, match="alpha"):
        blend_params(a, a, 1.5)
    with pytest.raises(ValueError, match="architecture"):
        blend_params(a, {"other": np.zeros(3, np.float32)}, 0.5)


def test_alpha_endpoints_reproduce_sources(tmp_path, rng):
    from gan_sr_wind_field_tpu.eval.interp import interpolated_sr

    cfg, gan, s_a, s_b, path_a, path_b = _two_states(tmp_path)
    x = np.arange(16, dtype=np.float32) * 150
    lr = rng.standard_normal((4, 4, 4, 4)).astype(np.float32) * 0.1
    zt = rng.standard_normal((16, 16, 4, 1)).astype(np.float32)

    sr1 = interpolated_sr(cfg, path_a, path_b, 1.0, x, x)
    np.testing.assert_array_equal(
        sr1.upscale(lr, zt), np.asarray(gan.generate(s_a.params_G,
                                                     lr[None], zt[None]))[0]
    )
    sr0 = interpolated_sr(cfg, path_a, path_b, 0.0, x, x)
    np.testing.assert_array_equal(
        sr0.upscale(lr, zt), np.asarray(gan.generate(s_b.params_G,
                                                     lr[None], zt[None]))[0]
    )
    # and a genuine blend differs from both endpoints
    sr_mid = interpolated_sr(cfg, path_a, path_b, 0.5, x, x)
    mid = sr_mid.upscale(lr, zt)
    assert not np.array_equal(mid, sr0.upscale(lr, zt))
    assert not np.array_equal(mid, sr1.upscale(lr, zt))


def test_cli_emits_serving_artifact(tmp_path, rng):
    """End-to-end: module CLI blends two checkpoints into a .wsrx the
    artifact loader can serve."""
    from gan_sr_wind_field_tpu.eval.export import load_exported

    cfg, gan, s_a, s_b, path_a, path_b = _two_states(tmp_path)
    cfg_path = tmp_path / "arch.ini"
    cfg.save(str(cfg_path))
    out = str(tmp_path / "blend.wsrx")
    rc = main(["--cfg", str(cfg_path), "--gan", path_a, "--psnr", path_b,
               "--alpha", "0.8", "--out", out])
    assert rc == 0

    sr = load_exported(out)
    lr = rng.standard_normal((4, 4, 4, 4)).astype(np.float32) * 0.1
    zt = rng.standard_normal((16, 16, 4, 1)).astype(np.float32)
    got = sr.upscale(lr, zt)
    want_params = blend_params(s_a.params_G, s_b.params_G, 0.8)
    want = np.asarray(gan.generate(want_params, lr[None], zt[None]))[0]
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_cli_stats_from_enables_physical_units(tmp_path, rng):
    """--stats_from copies norm_stats out of an existing export (header
    read only) so the BLENDED artifact serves physical units too."""
    from gan_sr_wind_field_tpu.eval.export import (
        export_generator,
        load_exported,
        read_header,
    )

    cfg, gan, s_a, s_b, path_a, path_b = _two_states(tmp_path)
    stats = {"z_min": -2.7, "z_max": 550.4, "z_above_ground_max": 68.5,
             "uvw_max": 32.33, "p_min": 0.0, "p_max": 105182.8}
    donor = str(tmp_path / "donor.wsrx")
    export_generator(gan, s_a.params_G, donor, norm_stats=stats)
    assert read_header(donor)["norm_stats"] == stats

    cfg_path = tmp_path / "arch.ini"
    cfg.save(str(cfg_path))
    out = str(tmp_path / "blend.wsrx")
    rc = main(["--cfg", str(cfg_path), "--gan", path_a, "--psnr", path_b,
               "--alpha", "0.5", "--out", out, "--stats_from", donor])
    assert rc == 0

    sr = load_exported(out)
    assert sr.norm_stats == stats
    assert sr.lr_channels == ["u", "v", "w", "z"]  # tiny_cfg layout
    from gan_sr_wind_field_tpu.data.transform import physical_to_model_inputs

    lr_uvw = rng.standard_normal((4, 4, 4, 3)).astype(np.float32)
    z = rng.standard_normal((16, 16, 4)).astype(np.float32)
    got = sr.upscale_physical(lr_uvw, z)
    want_lr, want_zt = physical_to_model_inputs(
        lr_uvw, z, stats, sr.scale, include_z_channel=True
    )
    np.testing.assert_allclose(
        got, sr.upscale(want_lr, want_zt) * stats["uvw_max"],
        rtol=1e-6, atol=1e-6,
    )

    # a donor without stats is rejected with a clear message
    bare = str(tmp_path / "bare.wsrx")
    export_generator(gan, s_a.params_G, bare)
    with pytest.raises(SystemExit, match="no norm_stats"):
        main(["--cfg", str(cfg_path), "--gan", path_a, "--psnr", path_b,
              "--alpha", "0.5", "--out", out, "--stats_from", bare])
