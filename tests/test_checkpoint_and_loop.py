"""Checkpoint round-trip (bit-exact resume) and end-to-end train-loop smoke
test on synthetic data — the analogue of the reference's 10-iteration local
smoke config (SURVEY.md §4)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gan_sr_wind_field_tpu.config import Config
from gan_sr_wind_field_tpu.data import preprocess
from gan_sr_wind_field_tpu.train import checkpoint as ckpt
from gan_sr_wind_field_tpu.train.gan import WindFieldGAN
from gan_sr_wind_field_tpu.train.loop import train
from gan_sr_wind_field_tpu.utils.logging import setup_loggers

from test_train_step import make_batch, tiny_cfg



class TestCheckpoint:
    def test_roundtrip_bit_exact(self, tmp_path, rng):
        cfg = tiny_cfg()
        x = np.arange(16, dtype=np.float32) * 150
        gan = WindFieldGAN(cfg, x, x)
        state = gan.init_state(
            jax.random.key(0), (2, 4, 4, 4, 4), (2, 16, 16, 4, 3)
        )
        lr, hr, z = make_batch(rng)
        for _ in range(3):
            state, _ = gan.train_step(state, lr, hr, z)

        path = ckpt.save_checkpoint(str(tmp_path), state)
        assert os.path.exists(path)
        assert ckpt.latest_checkpoint(str(tmp_path)) == path

        fresh = gan.init_state(
            jax.random.key(99), (2, 4, 4, 4, 4), (2, 16, 16, 4, 3)
        )
        restored = ckpt.restore_checkpoint(path, fresh)
        assert int(restored.it) == 3

        # training continues identically from the restored state
        s_a = jax.tree.map(jnp.copy, state)
        s_b = restored
        for _ in range(2):
            s_a, m_a = gan.train_step(s_a, lr, hr, z)
            s_b, m_b = gan.train_step(s_b, lr, hr, z)
        np.testing.assert_array_equal(
            np.asarray(m_a["total"]), np.asarray(m_b["total"])
        )
        for a, b in zip(jax.tree.leaves(s_a.params_G), jax.tree.leaves(s_b.params_G)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestCheckpointRetention:
    def test_keep_last_prunes_older(self, tmp_path, rng):
        cfg = tiny_cfg()
        x = np.arange(16, dtype=np.float32) * 150
        gan = WindFieldGAN(cfg, x, x)
        state = gan.init_state(
            jax.random.key(0), (2, 4, 4, 4, 4), (2, 16, 16, 4, 3)
        )
        lr, hr, z = make_batch(rng)
        for _ in range(3):
            state, _ = gan.train_step(state, lr, hr, z)
            ckpt.save_checkpoint(str(tmp_path), state, keep_last=2)
        names = sorted(
            n for n in os.listdir(str(tmp_path)) if n.startswith("ckpt_")
        )
        assert names == ["ckpt_2", "ckpt_3"]
        # keep_last=0 keeps everything (reference behaviour)
        state, _ = gan.train_step(state, lr, hr, z)
        ckpt.save_checkpoint(str(tmp_path), state, keep_last=0)
        assert len(os.listdir(str(tmp_path))) == 3


class TestPreemption:
    def test_sigterm_checkpoints_and_exits(self, tmp_path):
        """SIGTERM mid-run → clean exit with a resumable checkpoint
        (pod-preemption elastic recovery)."""
        import signal
        import threading

        cfg = Config()
        cfg.scale = 4
        cfg.compute_dtype = "float32"
        cfg.use_tensorboard_logger = False
        cfg.display_bar = False
        cfg.env.data_root = str(tmp_path / "data")
        cfg.env.this_runs_folder = str(tmp_path / "run")
        cfg.env.this_runs_tensorboard_log_folder = str(tmp_path / "run" / "tb")
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
        t = cfg.training
        t.niter = 10_000  # would run forever without the signal
        t.val_period = 10_000
        t.log_period = 10_000
        t.save_model_period = 10_000
        t.d_g_train_period = 2
        cfg.dataset_train.batch_size = 2

        setup_loggers(str(tmp_path / "log"), also_log_to_terminal=False)
        ds_train, _, ds_val, x, y = preprocess(
            cfg, synthetic=True, synthetic_hours=8
        )
        # warm the compile caches so the timed run's first step is fast —
        # otherwise a cold compile could eat the whole timer window and the
        # signal would land before any step completed
        train(cfg, ds_train, None, x, y, max_steps=1)
        timer = threading.Timer(
            6.0, lambda: os.kill(os.getpid(), signal.SIGTERM)
        )
        timer.start()
        try:
            state = train(cfg, ds_train, None, x, y)
        finally:
            timer.cancel()
        assert 0 < int(state.it) < 10_000
        path = ckpt.latest_checkpoint(cfg.env.this_runs_folder)
        assert path is not None
        restored = ckpt.restore_checkpoint(
            path,
            jax.tree.map(jnp.copy, state),
        )
        assert int(restored.it) == int(state.it)


class TestTrainLoopSmoke:
    def test_ten_iterations_synthetic(self, tmp_path):
        cfg = Config()
        cfg.scale = 4
        cfg.compute_dtype = "float32"
        cfg.use_tensorboard_logger = False
        cfg.env.data_root = str(tmp_path / "data")
        cfg.env.this_runs_folder = str(tmp_path / "run")
        cfg.env.this_runs_tensorboard_log_folder = str(tmp_path / "run" / "tb")
        cfg.gan_config.include_pressure = False
        cfg.gan_config.include_z_channel = True
        cfg.gan_config.number_of_z_layers = 4
        cfg.gan_config.enable_slicing = True
        cfg.gan_config.slice_size = 16
        cfg.gan_config.interpolate_z = False
        g = cfg.generator
        g.num_features = 8
        g.num_RRDB = 1
        g.num_RDB_convs = 2
        g.RDB_growth_chan = 4
        g.hr_kern_size = 3
        g.terrain_number_of_features = 4
        cfg.discriminator.num_features = 4
        t = cfg.training
        t.niter = 10
        t.val_period = 5
        t.log_period = 2
        t.save_model_period = 10
        t.d_g_train_period = 2
        t.d_g_train_ratio = 1
        cfg.dataset_train.batch_size = 2
        cfg.dataset_val.batch_size = 2

        setup_loggers(str(tmp_path / "log"), also_log_to_terminal=False)
        ds_train, _, ds_val, x, y = preprocess(
            cfg, synthetic=True, synthetic_hours=12
        )
        # shrink z: synthetic cache honours number_of_z_layers already
        state = train(cfg, ds_train, ds_val, x, y)
        assert int(state.it) == 10
        # checkpoint written at it=10
        assert ckpt.latest_checkpoint(cfg.env.this_runs_folder) is not None
        # val images dumped at it 5 and 10
        imgs = os.listdir(os.path.join(cfg.env.this_runs_folder, "images"))
        assert any("val_imgs__it_5" in n for n in imgs)
        # events stream exists
        assert os.path.exists(
            os.path.join(cfg.env.this_runs_tensorboard_log_folder, "events.jsonl")
        )


def _loop_cfg(tmp_path, niter=0):
    cfg = Config()
    cfg.scale = 4
    cfg.compute_dtype = "float32"
    cfg.use_tensorboard_logger = False
    cfg.display_bar = False
    cfg.env.data_root = str(tmp_path / "data")
    cfg.env.this_runs_folder = str(tmp_path / "run")
    cfg.env.this_runs_tensorboard_log_folder = str(tmp_path / "run" / "tb")
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
    t = cfg.training
    t.niter = niter
    t.val_period = 10_000
    t.log_period = 10_000
    t.save_model_period = 10_000
    t.d_g_train_period = 2
    cfg.dataset_train.batch_size = 2
    return cfg


class TestWarmStart:
    """reference train.py:78-102 semantics: load_model_from_save loads
    weights; resume_training_from_save additionally restores the training
    state. Both runs use niter=0 so the returned state is exactly what the
    loader produced."""

    def test_pth_generator_warm_start(self, tmp_path, rng):
        from gan_sr_wind_field_tpu.utils.torch_import import (
            save_reference_checkpoint,
        )

        cfg = _loop_cfg(tmp_path)
        setup_loggers(str(tmp_path / "log"), also_log_to_terminal=False)
        ds_train, _, _, x, y = preprocess(cfg, synthetic=True,
                                          synthetic_hours=8)
        gan = WindFieldGAN(cfg, x, y)
        donor = gan.init_state(
            jax.random.key(7), (2, 4, 4, 4, 4), (2, 16, 16, 4, 3)
        )
        pth = save_reference_checkpoint(
            str(tmp_path / "G_42.pth"), donor.params_G, gan.G
        )

        cfg.load_model_from_save = True
        cfg.env.generator_load_path = pth
        cfg.training.resume_training_from_save = False
        state = train(cfg, ds_train, None, x, y)
        assert int(state.it) == 0  # fresh training state
        got = jax.tree_util.tree_leaves(state.params_G)
        want = jax.tree_util.tree_leaves(donor.params_G)
        for a, b in zip(got, want):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-7)

    def test_orbax_weights_only_load(self, tmp_path, rng):
        cfg = _loop_cfg(tmp_path)
        setup_loggers(str(tmp_path / "log"), also_log_to_terminal=False)
        ds_train, _, _, x, y = preprocess(cfg, synthetic=True,
                                          synthetic_hours=8)
        gan = WindFieldGAN(cfg, x, y)
        donor = gan.init_state(
            jax.random.key(9), (2, 4, 4, 4, 4), (2, 16, 16, 4, 3)
        )
        donor = donor.replace(it=jnp.int32(123))
        path = ckpt.save_checkpoint(
            str(tmp_path / "donor_run"), donor, keep_last=0
        )

        cfg.load_model_from_save = True
        cfg.env.generator_load_path = str(path)
        cfg.training.resume_training_from_save = False
        state = train(cfg, ds_train, None, x, y)
        # weights taken from the checkpoint, training state reset
        assert int(state.it) == 0
        got = jax.tree_util.tree_leaves(state.params_D)
        want = jax.tree_util.tree_leaves(donor.params_D)
        for a, b in zip(got, want):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_first_launch_resumable_loads_weights(self, tmp_path, rng):
        """load_model_from_save + resume_training_from_save on a FRESH run
        folder (nothing to resume yet) must still warm-start the weights —
        the first launch of every preemption-resilient fine-tune."""
        cfg = _loop_cfg(tmp_path)
        setup_loggers(str(tmp_path / "log"), also_log_to_terminal=False)
        ds_train, _, _, x, y = preprocess(cfg, synthetic=True,
                                          synthetic_hours=8)
        gan = WindFieldGAN(cfg, x, y)
        donor = gan.init_state(
            jax.random.key(11), (2, 4, 4, 4, 4), (2, 16, 16, 4, 3)
        )
        path = ckpt.save_checkpoint(
            str(tmp_path / "donor_run"), donor, keep_last=0
        )
        cfg.load_model_from_save = True
        cfg.env.generator_load_path = str(path)
        cfg.training.resume_training_from_save = True  # nothing to resume
        state = train(cfg, ds_train, None, x, y)
        assert int(state.it) == 0
        got = jax.tree_util.tree_leaves(state.params_G)
        want = jax.tree_util.tree_leaves(donor.params_G)
        for a, b in zip(got, want):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_resume_checkpoint_supersedes_pth(self, tmp_path, rng):
        """Once a resume checkpoint exists, the .pth warm start is skipped
        entirely (the checkpoint already contains the further-trained
        weights)."""
        from gan_sr_wind_field_tpu.utils.torch_import import (
            save_reference_checkpoint,
        )

        cfg = _loop_cfg(tmp_path)
        setup_loggers(str(tmp_path / "log"), also_log_to_terminal=False)
        ds_train, _, _, x, y = preprocess(cfg, synthetic=True,
                                          synthetic_hours=8)
        gan = WindFieldGAN(cfg, x, y)
        pth_donor = gan.init_state(
            jax.random.key(13), (2, 4, 4, 4, 4), (2, 16, 16, 4, 3)
        )
        pth = save_reference_checkpoint(
            str(tmp_path / "G_1.pth"), pth_donor.params_G, gan.G
        )
        resumed = gan.init_state(
            jax.random.key(17), (2, 4, 4, 4, 4), (2, 16, 16, 4, 3)
        ).replace(it=jnp.int32(77))
        ckpt.save_checkpoint(cfg.env.this_runs_folder, resumed, keep_last=0)

        cfg.load_model_from_save = True
        cfg.env.generator_load_path = pth
        cfg.training.resume_training_from_save = True
        state = train(cfg, ds_train, None, x, y, max_steps=77)
        assert int(state.it) == 77  # checkpoint won, .pth skipped
        got = jax.tree_util.tree_leaves(state.params_G)
        want = jax.tree_util.tree_leaves(resumed.params_G)
        for a, b in zip(got, want):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_mixed_format_d_only_pth(self, tmp_path, rng, monkeypatch):
        """discriminator_load_path=.pth with no generator source routes
        through load_reference_discriminator and installs the D weights
        (reference baseGAN.load_model:52-60). The .pth→flax conversion
        itself is unit-covered in test_torch_import; this pins the loop
        wiring, so the loader is stubbed with shape-compatible params."""
        cfg = _loop_cfg(tmp_path)
        setup_loggers(str(tmp_path / "log"), also_log_to_terminal=False)
        ds_train, _, _, x, y = preprocess(cfg, synthetic=True,
                                          synthetic_hours=8)
        gan = WindFieldGAN(cfg, x, y)
        donor = gan.init_state(
            jax.random.key(19), (2, 4, 4, 4, 4), (2, 16, 16, 4, 3)
        )
        d_path = str(tmp_path / "D_1.pth")
        open(d_path, "wb").close()  # existence sentinel only
        seen = {}

        def _fake_load(discriminator, path):
            seen["path"] = path
            return donor.params_D, donor.batch_stats_D

        import gan_sr_wind_field_tpu.utils.torch_import as ti

        monkeypatch.setattr(ti, "load_reference_discriminator", _fake_load)
        cfg.load_model_from_save = True
        cfg.env.discriminator_load_path = d_path
        cfg.training.resume_training_from_save = False
        state = train(cfg, ds_train, None, x, y)
        assert seen["path"] == d_path
        assert int(state.it) == 0
        got = jax.tree_util.tree_leaves(state.params_D)
        want = jax.tree_util.tree_leaves(donor.params_D)
        for a, b in zip(got, want):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_profile_window_flushes_on_short_run(tmp_path, rng):
    """--profile on a run shorter than the 10-step window must still stop
    the trace (file flushed; no dangling profiler session for a second
    in-process train())."""
    import glob

    cfg = _loop_cfg(tmp_path, niter=2)
    setup_loggers(str(tmp_path / "log"), also_log_to_terminal=False)
    ds_train, _, _, x, y = preprocess(cfg, synthetic=True, synthetic_hours=8)
    prof_dir = str(tmp_path / "prof")
    train(cfg, ds_train, None, x, y, profile_dir=prof_dir)
    assert glob.glob(os.path.join(prof_dir, "plugins", "profile", "*")), (
        "no profile trace flushed"
    )
    # a second profiled run in the same process must not raise
    # "trace already started"
    cfg.env.this_runs_folder = str(tmp_path / "run2")
    train(cfg, ds_train, None, x, y, profile_dir=str(tmp_path / "prof2"))


def test_loop_reaches_niter_when_batch_nearly_spans_split(tmp_path):
    """Epoch budgeting regression: with drop_remainder an epoch yields
    floor(len/batch) batches, so len=3 @ batch=2 gives ONE batch/epoch.
    The old ratio-based epoch count (ceil(niter*batch/len)+1) undercounted
    and training silently ended short of niter at iterator exhaustion
    (observed on TPU: a 600-it run ending at it 507 with 38 samples @
    batch 32)."""
    cfg = _loop_cfg(tmp_path, niter=10)
    setup_loggers(str(tmp_path / "log"), also_log_to_terminal=False)
    ds_train, _, _, x, y = preprocess(cfg, synthetic=True, synthetic_hours=4)
    assert len(ds_train) == 3  # 80% chronological split of 4 hours
    state = train(cfg, ds_train, None, x, y)
    assert int(state.it) == 10


def test_checkpoint_roundtrip_with_ema(tmp_path, rng):
    """EMA weights persist through save/restore (they live in the state
    pytree) and resume training identically."""
    cfg = tiny_cfg(g_ema_decay=0.9)
    x = np.arange(16, dtype=np.float32) * 150
    gan = WindFieldGAN(cfg, x, x)
    state = gan.init_state(
        jax.random.key(0), (2, 4, 4, 4, 4), (2, 16, 16, 4, 3)
    )
    lr, hr, z = make_batch(rng)
    for _ in range(3):
        state, _ = gan.train_step(state, lr, hr, z)
    path = ckpt.save_checkpoint(str(tmp_path), state)

    fresh = gan.init_state(
        jax.random.key(99), (2, 4, 4, 4, 4), (2, 16, 16, 4, 3)
    )
    restored = ckpt.restore_checkpoint(path, fresh)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)
        ),
        state.params_G_ema, restored.params_G_ema,
    )
    s_a, _ = gan.train_step(state, lr, hr, z)
    s_b, _ = gan.train_step(restored, lr, hr, z)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)
        ),
        s_a.params_G_ema, s_b.params_G_ema,
    )


def test_checkpoint_ema_cross_config_restore(tmp_path, rng):
    """EMA-slot reconciliation: an EMA checkpoint restores under a
    non-EMA config (keeping the EMA weights), and a pre-EMA checkpoint
    restores under an EMA config (EMA seeded from the live weights)."""
    x = np.arange(16, dtype=np.float32) * 150
    shapes = ((2, 4, 4, 4, 4), (2, 16, 16, 4, 3))
    lr, hr, z = make_batch(rng)

    gan_ema = WindFieldGAN(tiny_cfg(g_ema_decay=0.9), x, x)
    s = gan_ema.init_state(jax.random.key(0), *shapes)
    for _ in range(2):
        s, _ = gan_ema.train_step(s, lr, hr, z)
    path_ema = ckpt.save_checkpoint(str(tmp_path / "ema"), s)

    gan_plain = WindFieldGAN(tiny_cfg(), x, x)
    s_plain = gan_plain.init_state(jax.random.key(0), *shapes)
    for _ in range(2):
        s_plain, _ = gan_plain.train_step(s_plain, lr, hr, z)
    path_plain = ckpt.save_checkpoint(str(tmp_path / "plain"), s_plain)

    # EMA ckpt -> plain config: live weights AND the ema survive
    ex_plain = gan_plain.init_state(jax.random.key(9), *shapes)
    r = ckpt.restore_checkpoint(path_ema, ex_plain)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        r.params_G, s.params_G,
    )
    assert r.params_G_ema is not None
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        r.params_G_ema, s.params_G_ema,
    )

    # plain ckpt -> EMA config: EMA seeded from the restored live weights
    ex_ema = gan_ema.init_state(jax.random.key(9), *shapes)
    r2 = ckpt.restore_checkpoint(path_plain, ex_ema)
    assert r2.params_G_ema is not None
    jax.tree.map(
        lambda e, p: np.testing.assert_array_equal(np.asarray(e),
                                                   np.asarray(p)),
        r2.params_G_ema, r2.params_G,
    )
    # and training continues (the seeded EMA is donation-safe)
    s3, _ = gan_ema.train_step(r2, lr, hr, z)
    assert s3.params_G_ema is not None


def test_restore_pre_ema_legacy_checkpoint(tmp_path, rng):
    """Checkpoints written BEFORE the params_G_ema field existed have no
    such key on disk at all; restore must still work under both non-EMA
    and EMA configs (regression: the EMA state addition must not orphan
    existing run checkpoints)."""
    import orbax.checkpoint as ocp

    from gan_sr_wind_field_tpu.train.checkpoint import (
        _LEGACY_FIELDS,
        _LegacyStateV1,
        _to_savable,
    )

    x = np.arange(16, dtype=np.float32) * 150
    shapes = ((2, 4, 4, 4, 4), (2, 16, 16, 4, 3))
    gan = WindFieldGAN(tiny_cfg(), x, x)
    s = gan.init_state(jax.random.key(0), *shapes)
    lr, hr, z = make_batch(rng)
    s, _ = gan.train_step(s, lr, hr, z)

    # write the OLD 8-field layout directly (what old runs have on disk)
    legacy = _LegacyStateV1(**{f: getattr(s, f) for f in _LEGACY_FIELDS})
    path = str(tmp_path / "ckpt_legacy")
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, _to_savable(legacy), force=True)
    ckptr.wait_until_finished()

    # non-EMA config
    ex = gan.init_state(jax.random.key(9), *shapes)
    r = ckpt.restore_checkpoint(path, ex)
    assert r.params_G_ema is None
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        r.params_G, s.params_G,
    )

    # EMA config: seeded from the restored live weights
    gan_e = WindFieldGAN(tiny_cfg(g_ema_decay=0.9), x, x)
    ex_e = gan_e.init_state(jax.random.key(9), *shapes)
    r2 = ckpt.restore_checkpoint(path, ex_e)
    assert r2.params_G_ema is not None
    jax.tree.map(
        lambda e, p: np.testing.assert_array_equal(np.asarray(e),
                                                   np.asarray(p)),
        r2.params_G_ema, r2.params_G,
    )


# core inner-loop tier: `pytest -m smoke` (VERDICT r4 next 8)
pytestmark = pytest.mark.smoke
