"""Cross-session continuation packs (train/continuation.py): compact bf16
weight packs that survive VM recycles through git.

Covers: flatten/unflatten round-trip, bf16 storage fidelity, it carriage,
pack_from_state on a real tiny GAN state, and the warm-start semantics in
train/loop.py (weights + it restored, schedule continues, optimizer
moments reset) — the mechanism behind chained long-horizon runs
(VERDICT r4 #7; reference regime config_cluster.ini:98-136)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gan_sr_wind_field_tpu.train import checkpoint as ckpt
from gan_sr_wind_field_tpu.train.continuation import (
    load_continuation,
    pack_from_state,
    save_continuation,
)
from gan_sr_wind_field_tpu.train.gan import WindFieldGAN

from test_train_step import make_batch, tiny_cfg



class TestPackFormat:
    def test_roundtrip_nested_trees(self, tmp_path):
        rng = np.random.default_rng(0)
        pg = {"conv": {"kernel": rng.normal(size=(3, 3, 2, 4)).astype("f4"),
                       "bias": rng.normal(size=(4,)).astype("f4")},
              "head": {"w": rng.normal(size=(4, 3)).astype("f4")}}
        pd = {"d0": {"kernel": rng.normal(size=(2, 2, 2, 2)).astype("f4")}}
        path = str(tmp_path / "pack.npz")
        save_continuation(path, pg, pd, it=1234)
        out = load_continuation(path)
        assert out["it"] == 1234
        assert out["params_G_ema"] is None
        assert out["batch_stats_D"] is None
        for ref, got in ((pg, out["params_G"]), (pd, out["params_D"])):
            rl = jax.tree.leaves(ref)
            gl = jax.tree.leaves(got)
            assert len(rl) == len(gl)
            for a, b in zip(rl, gl):
                assert b.dtype == np.float32
                # bf16 storage: 8-bit mantissa round-trip
                np.testing.assert_allclose(a, b, rtol=8e-3, atol=1e-6)
        # tree STRUCTURE (key names) survives
        assert set(out["params_G"]) == {"conv", "head"}
        assert set(out["params_G"]["conv"]) == {"kernel", "bias"}

    def test_fp32_storage_is_exact(self, tmp_path):
        a = np.random.default_rng(1).normal(size=(5, 5)).astype("f4")
        path = str(tmp_path / "p.npz")
        save_continuation(path, {"w": a}, store_dtype="float32")
        out = load_continuation(path)
        np.testing.assert_array_equal(out["params_G"]["w"], a)

    def test_future_format_rejected(self, tmp_path):
        import json

        path = str(tmp_path / "p.npz")
        save_continuation(path, {"w": np.zeros(3, "f4")})
        with np.load(path) as z:
            arrays = {k: z[k] for k in z.files}
        meta = json.loads(str(arrays["__meta__"]))
        meta["format_version"] = 99
        arrays["__meta__"] = np.asarray(json.dumps(meta))
        np.savez(path, **arrays)
        with pytest.raises(ValueError, match="format"):
            load_continuation(path)


class TestStatePack:
    def test_pack_from_state_and_warm_start(self, tmp_path, rng):
        cfg = tiny_cfg()
        cfg.training.g_ema_decay = 0.9
        x = np.arange(16, dtype=np.float32) * 150
        gan = WindFieldGAN(cfg, x, x)
        state = gan.init_state(
            jax.random.key(0), (2, 4, 4, 4, 4), (2, 16, 16, 4, 3)
        )
        lr, hr, z = make_batch(rng)
        for _ in range(3):
            state, _ = gan.train_step(state, lr, hr, z)

        path = str(tmp_path / "cont.npz")
        pack_from_state(path, state, extra_meta={"name": "tiny"})
        out = load_continuation(path)
        assert out["it"] == 3
        assert out["meta"]["name"] == "tiny"
        assert out["params_G_ema"] is not None
        for a, b in zip(jax.tree.leaves(state.params_G),
                        jax.tree.leaves(out["params_G"])):
            np.testing.assert_allclose(
                np.asarray(a, np.float32), b, rtol=8e-3, atol=1e-5
            )
        # pack is small: bf16 halves f32 params (compressed ≤ raw f32/2)
        n_bytes = sum(
            np.asarray(l).nbytes
            for t in (state.params_G, state.params_D, state.params_G_ema)
            for l in jax.tree.leaves(t)
        )
        assert os.path.getsize(path) < 0.75 * n_bytes

    def test_train_loop_warm_start_continues_schedule(self, tmp_path, rng):
        """generator_load_path=.npz restores weights AND it (LR schedule
        position), resets optimizer moments, and seeds the EMA slot."""
        from gan_sr_wind_field_tpu.data import preprocess
        from gan_sr_wind_field_tpu.train.loop import train
        from gan_sr_wind_field_tpu.utils.logging import setup_loggers

        cfg = tiny_cfg()
        cfg.training.g_ema_decay = 0.9
        cfg.training.niter = 5
        cfg.training.multistep_lr = True
        cfg.training.multistep_lr_steps = [4]
        cfg.training.lr_gamma = 0.5
        x = np.arange(16, dtype=np.float32) * 150
        gan = WindFieldGAN(cfg, x, x)
        state = gan.init_state(
            jax.random.key(0), (2, 4, 4, 4, 4), (2, 16, 16, 4, 3)
        )
        lr, hr, z = make_batch(rng)
        for _ in range(3):
            state, _ = gan.train_step(state, lr, hr, z)
        pack = str(tmp_path / "cont.npz")
        pack_from_state(pack, state)

        run_dir = str(tmp_path / "run")
        os.makedirs(run_dir)
        setup_loggers(str(tmp_path), also_log_to_terminal=False)
        cfg.load_model_from_save = True
        cfg.training.resume_training_from_save = False
        cfg.dataset_train.batch_size = 2
        cfg.dataset_val.batch_size = 2
        cfg.env.generator_load_path = pack
        cfg.env.this_runs_folder = run_dir
        cfg.env.this_runs_tensorboard_log_folder = str(tmp_path / "tb")
        cfg.use_tensorboard_logger = False
        ds_train, ds_test, ds_val, xx, yy = preprocess(
            cfg, synthetic=True, synthetic_hours=8, synthetic_size=16
        )
        train(cfg, ds_train, ds_val, xx, yy)
        final = ckpt.latest_checkpoint(run_dir)
        assert final is not None and final.endswith("ckpt_5")
        restored = ckpt.restore_checkpoint(
            final,
            gan.init_state(jax.random.key(1), (2, 4, 4, 4, 4),
                           (2, 16, 16, 4, 3)),
        )
        # ran 3 -> 5 (2 steps), not 0 -> 5: it was carried from the pack
        assert int(restored.it) == 5
        # EMA slot was seeded from the pack, not the random init: after
        # only 2 steps at decay .9 it must sit near the pack weights
        pg = jax.tree.leaves(restored.params_G_ema)
        src = jax.tree.leaves(state.params_G)
        diffs = [
            float(np.max(np.abs(np.asarray(a, np.float32) - np.asarray(b))))
            for a, b in zip(src, pg)
        ]
        assert max(diffs) < 0.05


# core inner-loop tier: `pytest -m smoke` (VERDICT r4 next 8)
pytestmark = pytest.mark.smoke
