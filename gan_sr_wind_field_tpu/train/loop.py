"""Training loop driver.

Counterpart of reference train.py:24-337, TPU-style:

- the hot loop is just: next prefetched batch → jitted `train_step` (all
  schedules/alternation live inside the compiled step),
- host-side work (logging, checkpointing, validation sweeps, figures) happens
  only at the configured periods and never blocks the device more than the
  metric fetches require,
- augmentation runs on-device inside the step (dataset host-side aug is
  disabled in that case) — the host just stacks patches,
- throughput (voxels/sec) is tracked and logged; `jax.profiler` traces can be
  enabled for the first iterations like the reference's torch.profiler window
  (train.py:112-120).
"""

from __future__ import annotations

import logging
import os
import pickle
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from gan_sr_wind_field_tpu.data.pipeline import prefetch_to_device
from gan_sr_wind_field_tpu.ops.resize import upsample_trilinear_xy
from gan_sr_wind_field_tpu.train import checkpoint as ckpt
from gan_sr_wind_field_tpu.train.gan import WindFieldGAN
from gan_sr_wind_field_tpu.utils.tb import MetricsWriter
from gan_sr_wind_field_tpu.viz.plots import (
    create_comparison_figure,
    create_error_figure,
)

TRAIN_LOSS_KEYS = (
    "total", "adversarial", "pix", "xy_gradient", "z_gradient",
    "divergence", "xy_divergence", "feature_D",
)


def train(cfg, dataset_train, dataset_validation, x, y,
          mesh: Optional[jax.sharding.Mesh] = None,
          data_sharding=None,
          profile_dir: Optional[str] = None,
          max_steps: Optional[int] = None):
    """Run training to cfg.training.niter. Returns the final state."""
    status = logging.getLogger("status")
    cfg_t = cfg.training
    run_folder = cfg.env.this_runs_folder or "./runs_root/run"
    os.makedirs(os.path.join(run_folder, "images"), exist_ok=True)
    tb = MetricsWriter(
        cfg.env.this_runs_tensorboard_log_folder
        or os.path.join(run_folder, "tb"),
        use_tensorboard=cfg.use_tensorboard_logger,
    )

    gan = WindFieldGAN(cfg, x, y, mesh=mesh)

    # consolidate the pickle cache into a zero-copy memmap (data/npcache.py)
    # — the host must assemble batches faster than the device steps
    try:
        dataset_train.use_npcache()
    except Exception as e:  # fall back to per-sample pickles
        status.info(f"npcache unavailable ({e}); using pickle loads")

    # device-side augmentation replaces host-side (same semantics, on-TPU)
    augment_on_device = bool(
        dataset_train.data_aug_rot or dataset_train.data_aug_flip
    )
    dataset_train.data_aug_rot = False
    dataset_train.data_aug_flip = False

    batch_size = cfg.dataset_train.batch_size if cfg.dataset_train else 1
    # multi-host pods: each process loads its shard of the global batch
    # (pipeline assembles global arrays via make_array_from_process_local_data)
    n_proc = jax.process_count()
    local_batch = max(batch_size // n_proc, 1) if n_proc > 1 else batch_size
    if n_proc > 1 and local_batch * n_proc != batch_size:
        logging.getLogger("status").warning(
            f"batch_size {batch_size} is not divisible by process_count "
            f"{n_proc}; effective global batch is {local_batch * n_proc}"
        )
    rng_np = np.random.default_rng(
        cfg.env.fixed_seed + (jax.process_index() if n_proc > 1 else 0)
    )
    if local_batch > len(dataset_train):
        raise ValueError(
            f"batch_size {local_batch} exceeds the train split "
            f"({len(dataset_train)} samples) — with drop_remainder the "
            f"loop would produce zero batches"
        )
    probe_lr, probe_hr, _probe_z = dataset_train.get(0, rng_np)

    state = gan.init_state(
        jax.random.key(cfg.env.fixed_seed),
        (batch_size,) + probe_lr.shape,
        (batch_size,) + probe_hr.shape,
    )

    if cfg.load_model_from_save:
        # reference semantics (train.py:78-102 + baseGAN.load_model):
        # load_model_from_save loads WEIGHTS (G always; D when
        # discriminator_load_path is set); resume_training_from_save
        # additionally restores the training state (optimizers, it, rng).
        # A found resume checkpoint supersedes the weight sources entirely
        # (it already contains the warm-started, further-trained weights),
        # so the warm start runs only when there is nothing to resume —
        # including the FIRST launch of a resumable run.
        resume_path = None
        if cfg_t.resume_training_from_save:
            resume_path = (cfg.env.state_load_path
                           or ckpt.latest_checkpoint(run_folder))
        if resume_path:
            state = ckpt.restore_checkpoint(resume_path, state)
            status.info(f"resumed from {resume_path} at it={int(state.it)}")
        else:
            g_path = cfg.env.generator_load_path
            d_path = cfg.env.discriminator_load_path
            g_is_pth = bool(g_path) and g_path.endswith(".pth")
            d_is_pth = bool(d_path) and d_path.endswith(".pth")
            if g_path and g_path.endswith(".npz"):
                # cross-session continuation pack (train/continuation.py):
                # weights + `it` survive a VM recycle through git; optimizer
                # moments and the data-stream rng reset (documented)
                from gan_sr_wind_field_tpu.train.continuation import (
                    load_continuation,
                )

                pack = load_continuation(g_path)
                repl = {"params_G": jax.tree.map(jnp.asarray,
                                                 pack["params_G"])}
                if pack["params_D"] is not None:
                    repl["params_D"] = jax.tree.map(
                        jnp.asarray, pack["params_D"]
                    )
                if pack["batch_stats_D"] is not None:
                    repl["batch_stats_D"] = jax.tree.map(
                        jnp.asarray, pack["batch_stats_D"]
                    )
                if state.params_G_ema is not None:
                    ema_src = (
                        pack["params_G_ema"]
                        if pack["params_G_ema"] is not None
                        else pack["params_G"]
                    )
                    repl["params_G_ema"] = jax.tree.map(
                        jnp.asarray, ema_src
                    )
                repl["it"] = jnp.int32(pack["it"])
                state = state.replace(**repl)
                status.info(
                    f"continuation warm start from {g_path} at "
                    f"it={pack['it']} (optimizer moments reset)"
                )
            elif g_is_pth:
                # warm start from reference torch checkpoints
                from gan_sr_wind_field_tpu.utils.torch_import import (
                    load_reference_checkpoint,
                )

                params_G, params_D, stats_D = load_reference_checkpoint(
                    gan.G, g_path, gan.D, d_path if d_is_pth else None,
                )
                repl = {"params_G": jax.tree.map(jnp.asarray, params_G)}
                if params_D is not None:
                    repl["params_D"] = jax.tree.map(jnp.asarray, params_D)
                    repl["batch_stats_D"] = jax.tree.map(
                        jnp.asarray, stats_D
                    )
                if state.params_G_ema is not None:
                    # seed the EMA slot from the imported weights — leaving
                    # it at the fresh random init would make the EMA anneal
                    # from noise for ~1/(1-decay) iterations
                    repl["params_G_ema"] = jax.tree.map(
                        jnp.asarray, params_G
                    )
                state = state.replace(**repl)
                status.info(
                    f"imported reference weights G={g_path}"
                    + (f" D={d_path}" if params_D is not None else "")
                )
            elif g_path:
                # weights-only load from an Orbax checkpoint: restore,
                # then keep params but reset the training state
                loaded = ckpt.restore_checkpoint(g_path, state)
                repl = dict(
                    params_G=loaded.params_G,
                    params_D=loaded.params_D,
                    batch_stats_D=loaded.batch_stats_D,
                    params_D_frozen=loaded.params_D_frozen,
                )
                if state.params_G_ema is not None:
                    # prefer the checkpoint's EMA slot; seed from its live
                    # weights otherwise (never keep the random init)
                    repl["params_G_ema"] = (
                        loaded.params_G_ema
                        if loaded.params_G_ema is not None
                        else jax.tree.map(jnp.copy, loaded.params_G)
                    )
                state = state.replace(**repl)
                status.info(
                    f"loaded weights (fresh training state) from {g_path}"
                )
            if d_is_pth and not g_is_pth:
                # mixed formats: Orbax (or no) G source + a reference D
                from gan_sr_wind_field_tpu.utils.torch_import import (
                    load_reference_discriminator,
                )

                params_D, stats_D = load_reference_discriminator(
                    gan.D, d_path
                )
                state = state.replace(
                    params_D=jax.tree.map(jnp.asarray, params_D),
                    batch_stats_D=jax.tree.map(jnp.asarray, stats_D),
                )
                status.info(f"imported reference weights D={d_path}")

    niter = min(cfg_t.niter, max_steps) if max_steps else cfg_t.niter
    start_it = int(state.it)
    status.info(f"beginning run at it={start_it}, target niter={niter}")

    it = start_it
    voxels_per_batch = batch_size * int(np.prod(probe_hr.shape[:3]))
    t_window, it_window = time.time(), it
    # an epoch yields floor(len/local_batch) batches (drop_remainder), NOT
    # len/batch — the old ratio-based count undercounted whenever
    # len % batch was large (38 samples @ batch 32 → 1 batch/epoch, not
    # 1.19) and training silently ended short of niter at iterator
    # exhaustion
    batches_per_epoch = max(len(dataset_train) // max(local_batch, 1), 1)
    epochs = max(
        1, int(np.ceil((niter - start_it) / batches_per_epoch)) + 1
    )

    use_device_data = (
        getattr(cfg, "device_resident_data", False)
        and jax.process_count() == 1
    )
    if use_device_data:
        # upload the split once, slice batches on device — removes the
        # per-step H2D transfer (data/device_data.py; dominant cost over
        # remote-tunnel runtimes)
        from gan_sr_wind_field_tpu.data.device_data import DeviceBatcher

        batcher = DeviceBatcher(
            dataset_train, local_batch,
            seed=int(rng_np.integers(0, 2**31 - 1)),
            sharding=data_sharding,
            # continue the batch/offset stream across resume legs (the
            # seed re-derives identically from fixed_seed each start)
            start_count=start_it,
        )
        status.info(
            "device-resident training data: "
            f"{batcher.resident_bytes() / 1e6:.0f} MB uploaded once"
        )
        prefetched = iter(batcher)
    else:
        batch_iter = dataset_train.batches(
            local_batch, rng_np, shuffle=True, epochs=epochs
        )
        prefetched = prefetch_to_device(batch_iter, sharding=data_sharding)

    bar = None
    if cfg.display_bar:
        from gan_sr_wind_field_tpu.utils.progress import DisplayBar

        bar = DisplayBar(
            max_value=max(len(dataset_train) // max(batch_size, 1), 1),
            start_it=it, niter=niter,
        )

    if profile_dir:
        jax.profiler.start_trace(profile_dir)

    # graceful preemption: TPU pods get SIGTERM before eviction — finish the
    # in-flight step, checkpoint, and exit cleanly so resume_training_from_save
    # continues bit-exact (elastic recovery, SURVEY.md §5)
    import signal as _signal

    stop_signal = []

    def _on_term(signum, frame):
        stop_signal.append(signum)

    old_handler = None
    try:
        old_handler = _signal.signal(_signal.SIGTERM, _on_term)
    except ValueError:  # not the main thread (e.g. driven from a test rig)
        pass

    # stall watchdog (elastic recovery): a hung remote-runtime RPC never
    # returns on its own — SIGTERM-to-self EINTRs it into the graceful
    # preemption path above; hard exit if the runtime is fully dead
    # (train/watchdog.py; measured failure mode, docs/evidence/longrun30k.md)
    watchdog = None
    if getattr(cfg_t, "stall_watchdog_s", 0) and old_handler is not None:
        from gan_sr_wind_field_tpu.train.watchdog import StallWatchdog

        watchdog = StallWatchdog(
            cfg_t.stall_watchdog_s,
            # a leg launched into a dead runtime hangs before step 1 and
            # never beats — bound the startup too (cold compile + upload
            # stay well under this)
            startup_deadline_s=max(6 * cfg_t.stall_watchdog_s, 1800),
        ).start()
        status.info(
            f"stall watchdog armed at first step: {cfg_t.stall_watchdog_s:.0f}s"
            f" (startup deadline {watchdog.startup_deadline_s:.0f}s)"
        )

    def boundary_work(metrics):
        """Logging / checkpoint / validation at the current ``it`` —
        shared by the per-step and chunked hot loops."""
        nonlocal state, t_window, it_window, profile_dir
        if watchdog is not None:
            watchdog.beat()
        if profile_dir and it - start_it >= 10:
            jax.block_until_ready(metrics["total"])
            jax.profiler.stop_trace()
            profile_dir = None

        if it % cfg_t.log_period == 0:
            host_m = {k: float(metrics[k]) for k in TRAIN_LOSS_KEYS}
            dt = time.time() - t_window
            ips = (it - it_window) / max(dt, 1e-9)
            t_window, it_window = time.time(), it
            status.info(
                f"it {it} G_total {host_m['total']:.5f} "
                f"D {float(metrics['D_train_loss']):.5f} "
                f"{ips:.2f} it/s ({ips * voxels_per_batch / 1e6:.2f} Mvox/s)"
            )
            tb.add_scalars("G_loss/train", host_m, it)
            if "G_grad_norm" in metrics and float(metrics["is_g_step"]) > 0:
                # thesis norm-during-training track (plot_data.py:521-533);
                # D steps carry a hardcoded 0.0 that would corrupt the series
                tb.add_scalars(
                    "metrics/grad",
                    {"G_grad_norm": float(metrics["G_grad_norm"])}, it,
                )
            tb.add_scalars(
                "perf", {"it_per_s": ips,
                         "voxels_per_s": ips * voxels_per_batch}, it,
            )

        if it % cfg_t.save_model_period == 0:
            if watchdog is not None:
                # checkpoint IO doesn't beat; don't let a slow save read
                # as a stall
                watchdog.grace(max(2 * cfg_t.stall_watchdog_s, 600))
            path = ckpt.save_checkpoint(
                run_folder, state, keep_last=cfg_t.keep_checkpoints
            )
            status.info(f"saved checkpoint {path}")
            if watchdog is not None:
                watchdog.beat()

        if dataset_validation is not None and it % cfg_t.val_period == 0:
            if watchdog is not None:
                # a val sweep whose graphs still need remote compiles
                # (val metrics + full-volume figure SR, 1-5 min EACH over
                # the tunnel) runs minutes without a step beat — measured
                # spurious SIGTERM at it 500 of the 30k evidence run;
                # same allowance as the startup deadline
                watchdog.grace(max(6 * cfg_t.stall_watchdog_s, 1800))
            state = run_validation(
                cfg, gan, state, dataset_validation, tb, run_folder, it
            )
            if watchdog is not None:
                watchdog.beat()

    chunk_steps = int(getattr(cfg, "steps_per_dispatch", 1) or 1)
    if use_device_data and chunk_steps > 1:
        # chunked hot loop: K steps per compiled dispatch, batches sliced
        # in-graph (gan.train_chunk). Chunks never cross a log/val/save
        # boundary or the profiler window; single steps fill remainders.
        periods = [cfg_t.log_period, cfg_t.save_model_period]
        if dataset_validation is not None:
            periods.append(cfg_t.val_period)
        periods = [p for p in periods if p and p > 0]

        def next_boundary(i):
            cands = [((i // p) + 1) * p for p in periods]
            cands.append(niter)
            if profile_dir:
                cands.append(start_it + 10)
            return min(c for c in cands if c > i)

        # distinct stream from the per-batch iterator (which folds its base
        # key with a batch counter): chunks fold with the absolute it
        chunk_key = jax.random.fold_in(batcher._key, 0x5EED)
        chunk_kw = dict(
            batch_size=local_batch,
            patch=(batcher.slice_size if batcher.enable_slicing
                   else batcher._full.shape[1]),
            patch_y=(batcher.slice_size if batcher.enable_slicing
                     else batcher._full.shape[2]),
            cf=batcher.cf,
            enable_slicing=batcher.enable_slicing,
            augment=augment_on_device,
        )
        while it < niter and not stop_signal:
            n = min(chunk_steps, next_boundary(it) - it)
            if n == chunk_steps:
                state, metrics = gan.train_chunk(
                    state, batcher._full, batcher._zraw, chunk_key,
                    n_steps=chunk_steps, **chunk_kw,
                )
                it += chunk_steps
            else:
                lr_b, hr_b, z_b = next(prefetched)
                it += 1
                state, metrics = gan.train_step(
                    state, lr_b, hr_b, z_b, augment=augment_on_device
                )
            if bar is not None:
                bar.update(
                    it % max(len(dataset_train) // max(batch_size, 1), 1),
                    it * batch_size // max(len(dataset_train), 1), it,
                )
            boundary_work(metrics)
        if stop_signal:
            status.warning(
                f"SIGTERM at it {it}: checkpointing and exiting cleanly"
            )
    else:
        for lr_b, hr_b, z_b in prefetched:
            if it >= niter:
                break
            if stop_signal:
                status.warning(
                    f"SIGTERM at it {it}: checkpointing and exiting cleanly"
                )
                break
            it += 1
            if bar is not None:
                bar.update(
                    it % max(len(dataset_train) // max(batch_size, 1), 1),
                    it * batch_size // max(len(dataset_train), 1), it,
                )
            state, metrics = gan.train_step(
                state, lr_b, hr_b, z_b, augment=augment_on_device
            )
            boundary_work(metrics)

    if it < niter and not stop_signal:
        status.warning(
            f"batch iterator exhausted at it {it} < niter {niter} — "
            "training ended early (epoch budget miscomputed?)"
        )
    if profile_dir:
        # run ended (or was preempted) before the 10-step window closed —
        # flush the trace so it isn't lost and the profiler session isn't
        # left dangling for a later train() in the same process
        jax.profiler.stop_trace()
    if int(state.it) != start_it:
        # the watchdog stays armed through this save: the final
        # checkpoint fetches the whole device state, and on a wedged
        # runtime that fetch hangs forever — measured on the 30k
        # evidence run (SIGTERM-preempted leg blocked in orbax save,
        # zero CPU progress; only the watchdog's hard exit 86 lets the
        # supervisor relaunch from the last periodic checkpoint)
        if watchdog is not None:
            watchdog.grace(max(2 * cfg_t.stall_watchdog_s, 600))
        ckpt.save_checkpoint(
            run_folder, state, keep_last=cfg_t.keep_checkpoints
        )
    if watchdog is not None:
        watchdog.stop()
    if old_handler is not None:
        # restored only after the final save: a watchdog SIGTERM during a
        # hung save must hit the no-op-by-now custom handler (stop_signal
        # already set), leaving escalation to the hard exit — not the
        # default handler, which would kill the process with rc -15
        _signal.signal(_signal.SIGTERM, old_handler)
    tb.close()
    return state


def run_validation(cfg, gan: WindFieldGAN, state, dataset_validation, tb,
                   run_folder, it):
    """Full validation sweep: averaged losses/metrics + figures + field dump
    (reference train.py:176-336)."""
    status = logging.getLogger("status")
    # deterministic track: same patch offsets every sweep (aug is already
    # off, data/__init__.py) so PSNR curves are comparable across its/runs
    deterministic = bool(cfg.dataset_val and cfg.dataset_val.deterministic)
    rng_np = np.random.default_rng(
        cfg.env.fixed_seed if deterministic else cfg.env.fixed_seed + it
    )
    batch_size = cfg.dataset_val.batch_size if cfg.dataset_val else 1

    sums, count = {}, 0
    last_batch = None
    for bi, (lr_b, hr_b, z_b) in enumerate(
        dataset_validation.batches(batch_size, rng_np, shuffle=False,
                                   drop_remainder=False)
    ):
        metrics, new_bs = gan.val_step(
            state, lr_b, hr_b, z_b, jax.random.fold_in(state.rng, bi)
        )
        # reference quirk: validation D forwards update BN running stats
        state = state.replace(batch_stats_D=new_bs)
        for k, v in metrics.items():
            sums[k] = sums.get(k, 0.0) + float(v)
        count += 1
        last_batch = (lr_b, hr_b, z_b)

    if count == 0:
        return state
    avgs = {k: v / count for k, v in sums.items()}
    tb.add_scalars(
        "G_loss/validation",
        {k.replace("G_val_", ""): v for k, v in avgs.items()
         if k.startswith("G_val_")},
        it,
    )
    tb.add_scalars("D_loss/", {"validation_loss": avgs["D_val_loss"]}, it)
    tb.add_scalars(
        "metrics/PSNR",
        {k: v for k, v in avgs.items() if "PSNR" in k}, it,
    )
    tb.add_scalars(
        "metrics/pix",
        {k: v for k, v in avgs.items() if "pix" in k}, it,
    )
    status.info(
        f"validation it {it}: PSNR {avgs['val_PSNR']:.3f} "
        f"(trilinear {avgs['Trilinear_PSNR']:.3f}) "
        f"G_total {avgs['G_val_total']:.5f}"
    )

    # field dumps + figures from one random sample (train.py:205-336)
    lr_b, hr_b, z_b = last_batch
    uvw_max = dataset_validation.stats.uvw_max
    i = int(np.random.default_rng(it).integers(0, lr_b.shape[0]))
    sr = np.asarray(gan.generate(state.params_G, lr_b[i : i + 1], z_b[i : i + 1]))[0]
    tl = np.asarray(
        upsample_trilinear_xy(lr_b[i : i + 1, ..., :3], cfg.scale)
    )[0]
    imgs = {
        "HR": np.moveaxis(hr_b[i] * uvw_max, -1, 0),
        "SR": np.moveaxis(sr * uvw_max, -1, 0),
        "BC": np.moveaxis(tl * uvw_max, -1, 0),
        "LR": np.moveaxis(lr_b[i, ..., :3] * uvw_max, -1, 0),
    }
    with open(os.path.join(run_folder, "images", f"val_imgs__it_{it}.pkl"),
              "wb") as f:
        pickle.dump(imgs, f)

    if cfg.use_tensorboard_logger:
        z_idx = min(3, hr_b.shape[3] - 1)
        comp = 0
        hr_c, sr_c, tl_c = (imgs["HR"][comp], imgs["SR"][comp], imgs["BC"][comp])
        lr_c = imgs["LR"][comp]
        sr_err = float(np.mean(np.abs(hr_c[:, :, z_idx] - sr_c[:, :, z_idx])))
        tl_err = float(np.mean(np.abs(hr_c[:, :, z_idx] - tl_c[:, :, z_idx])))
        tb.add_figure(
            f"im/{it}/wind_fields/u_field_z_index{z_idx}",
            create_comparison_figure(z_idx, lr_c, hr_c, sr_c, tl_c), it,
        )
        tb.add_figure(
            f"im/{it}/Error/u_field_z_index{z_idx}",
            create_error_figure(z_idx, hr_c, sr_c, tl_c, sr_err, tl_err), it,
        )
    return state
