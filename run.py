#!/usr/bin/env python
"""CLI entry point.

Counterpart of reference run.py:29-315: parses mode flags + config path,
creates run folders, seeds, snapshots the resolved config, prepares data, and
dispatches to train / test / use / download / param_search.

TPU additions: `--synthetic` trains on analytic wind fields (no network),
`--profile` captures a jax.profiler trace of the first iterations, and the
device mesh comes from [PARALLEL] in the config instead of gpu_id.
"""

from __future__ import annotations

import argparse
import logging
import os
import sys
import time


def argv_to_cfg(argv=None):
    p = argparse.ArgumentParser(description="TPU wind-field super-resolution GAN")
    p.add_argument("--cfg", default="configs/local.ini", help="config INI path")
    p.add_argument("--train", action="store_true")
    p.add_argument("--test", action="store_true")
    p.add_argument("--test_ema", action="store_true",
                   help="with --test: evaluate the checkpoint's EMA "
                        "generator slot (the deployment weights) instead "
                        "of the raw generator; outputs get an _ema suffix")
    p.add_argument("--use", action="store_true")
    p.add_argument("--no_ema", action="store_true",
                   help="with --use/--export/--serve: deploy the RAW "
                        "generator weights even when the checkpoint has an "
                        "EMA slot (default prefers EMA)")
    p.add_argument("--export", metavar="PATH", default=None,
                   help="serialize the generator (weights baked in) to a "
                        "self-contained jax.export artifact at PATH and "
                        "exit; loads weights like --use "
                        "(eval/export.py — no reference equivalent)")
    p.add_argument("--serve", metavar="PORT", type=int, default=None,
                   help="serve the generator over HTTP on PORT "
                        "(micro-batched inference daemon, eval/server.py); "
                        "loads weights like --use. For config-free serving "
                        "of an exported artifact use "
                        "python -m gan_sr_wind_field_tpu.eval.server")
    p.add_argument("--serve_warmup", metavar="B1,B2,...", default="",
                   help="with --serve: pre-compile the serving program at "
                        "these batch sizes before accepting traffic (each "
                        "remote TPU compile costs minutes; without warmup "
                        "the first request at a new padded batch size pays "
                        "it online)")
    p.add_argument("--serve_strict_shapes", action="store_true",
                   help="with --serve: reject /v1/upscale requests whose "
                        "LR sample shape differs from the training patch "
                        "(each new shape jit-compiles a new program — "
                        "minutes on a remote TPU — stalling all traffic); "
                        "arbitrary extents stay available via "
                        "/v1/upscale_tiled, which only submits the pinned "
                        "tile shape")
    p.add_argument("--serve_int8", metavar="N", type=int, default=0,
                   help="with --serve: calibrate the int8 HR-head serving "
                        "path over N test-set samples before serving "
                        "(small-batch latency lever, ops/quant.py; needs "
                        "the fused-trunk single-device path)")
    p.add_argument("--serve_int8_trunk", metavar="N", type=int, default=0,
                   help="with --serve: calibrate the int8 TRUNK serving "
                        "path over N test-set samples (large-batch "
                        "throughput lever: measured 1.30x at the batch-128 "
                        "knee, 0.63x at batch 32 — see docs/PERF.md; "
                        "ops/quant_trunk.py)")
    p.add_argument("--download", action="store_true")
    p.add_argument("--param_search", action="store_true")
    p.add_argument("--synthetic", action="store_true",
                   help="use analytic synthetic data instead of downloading")
    p.add_argument("--synthetic_hours", type=int, default=48,
                   help="number of hourly synthetic samples to generate")
    p.add_argument("--synthetic_size", type=int, default=64,
                   help="horizontal extent of the synthetic domain; larger "
                        "than slice_size gives true random-patch training")
    p.add_argument("--profile", action="store_true",
                   help="trace the first train iterations with jax.profiler")
    p.add_argument("--num_samples", type=int, default=250,
                   help="--param_search trial budget (reference "
                        "run.py:85-98 hardcodes 250)")
    p.add_argument("--asha_grace", type=int, default=1200,
                   help="--param_search ASHA grace period in iterations "
                        "(reference param_search.py:300); lower it for "
                        "reduced-budget sweeps")
    p.add_argument("--asha_eta", type=int, default=3,
                   help="--param_search ASHA reduction factor")
    p.add_argument("--slurm_array_id", type=int, default=1)
    p.add_argument("--loglevel", default="info")
    p.add_argument("--max_steps", type=int, default=None,
                   help="override: stop after this many iterations")
    args = p.parse_args(argv)

    from gan_sr_wind_field_tpu.config import Config

    cfg = Config.from_ini(args.cfg)
    cfg.is_train = args.train or args.param_search
    cfg.is_test = args.test
    cfg.is_use = args.use
    cfg.is_download = args.download
    cfg.is_param_search = args.param_search
    cfg.slurm_array_id = args.slurm_array_id
    return cfg, args


def setup_env_and_cfg(cfg):
    """Derive per-run folders (reference run.py:197-220) and snapshot the
    resolved config (run.py:279-288)."""
    root = os.path.expanduser(cfg.env.root_path)
    stamp = time.strftime("%Y-%m-%dT%H-%M-%S")
    run_name = f"{cfg.name}_{stamp}"
    cfg.env.this_runs_folder = os.path.join(
        root + cfg.env.runs_subpath, run_name
    )
    cfg.env.this_runs_tensorboard_log_folder = os.path.join(
        root + cfg.env.tensorboard_subpath, run_name
    )
    log_dir = root + cfg.env.log_subpath
    os.makedirs(cfg.env.this_runs_folder, exist_ok=True)
    os.makedirs(cfg.env.this_runs_tensorboard_log_folder, exist_ok=True)
    os.makedirs(log_dir, exist_ok=True)
    cfg.save(os.path.join(cfg.env.this_runs_folder, "config.ini"))
    return log_dir


def main(argv=None):
    cfg, args = argv_to_cfg(argv)
    log_dir = setup_env_and_cfg(cfg)

    from gan_sr_wind_field_tpu.utils.logging import setup_loggers

    level = getattr(logging, args.loglevel.upper(), logging.INFO)
    status, _ = setup_loggers(
        log_dir, also_log_to_terminal=cfg.also_log_to_terminal, level=level
    )
    status.info(f"run folder: {cfg.env.this_runs_folder}")

    import jax

    # explicit platform override (e.g. WINDSR_PLATFORM=cpu for CI) — this
    # image's sitecustomize force-selects the TPU tunnel backend otherwise
    if os.environ.get("WINDSR_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["WINDSR_PLATFORM"])

    # multi-host TPU pods: initialise the distributed runtime when the TPU
    # environment advertises multiple processes (no-op on a single host)
    if os.environ.get("TPU_WORKER_HOSTNAMES", "").count(",") > 0 or \
            os.environ.get("JAX_COORDINATOR_ADDRESS"):
        try:
            jax.distributed.initialize()
            status.info(
                f"jax.distributed: process {jax.process_index()}"
                f"/{jax.process_count()}"
            )
        except Exception as e:
            status.warning(f"jax.distributed.initialize failed: {e}")

    if os.environ.get("WINDSR_DEBUG_NANS"):
        jax.config.update("jax_debug_nans", True)

    # persistent compilation cache: TPU compiles of the full train step run
    # 1-5 minutes; cache them across process restarts (resume, sweeps, eval)
    cache_dir = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.expanduser(cfg.env.root_path), ".jax_cache"),
    )
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception as e:
        status.warning(f"compilation cache unavailable: {e}")

    status.info(f"jax devices: {jax.devices()}")

    from gan_sr_wind_field_tpu.data import preprocess

    if cfg.is_download:
        from datetime import date

        from gan_sr_wind_field_tpu.data.downloader import download_dataset

        download_dataset(
            cfg.env.data_root,
            date(*cfg.gan_config.start_date),
            date(*cfg.gan_config.end_date),
            number_of_z_layers=cfg.gan_config.number_of_z_layers,
        )
        status.info("download finished")
        if not (cfg.is_train or cfg.is_test or cfg.is_use):
            return

    ds_train, ds_test, ds_val, x, y = preprocess(
        cfg, synthetic=args.synthetic,
        synthetic_hours=args.synthetic_hours,
        synthetic_size=args.synthetic_size,
    )
    status.info(
        f"datasets: train {len(ds_train)} / test {len(ds_test)} / "
        f"val {len(ds_val)}"
    )

    if cfg.is_param_search:
        import os as _os

        from gan_sr_wind_field_tpu.search.driver import param_search

        param_search(
            cfg, ds_train, ds_val, x, y,
            num_samples=args.num_samples,
            shard_index=cfg.slurm_array_id % max(
                int(_os.environ.get("N_SHARDS", "1")), 1
            ),
            num_shards=max(int(_os.environ.get("N_SHARDS", "1")), 1),
            grace_period=args.asha_grace,
            reduction_factor=args.asha_eta,
        )
        return

    if cfg.is_train:
        from gan_sr_wind_field_tpu.parallel import make_mesh, volume_sharding
        from gan_sr_wind_field_tpu.train.loop import train

        mesh = None
        data_sh = None
        batch = cfg.dataset_train.batch_size if cfg.dataset_train else 1
        if len(jax.devices()) > 1:
            sp = cfg.parallel.spatial_parallel
            mesh = make_mesh(
                cfg.parallel.data_parallel, cfg.parallel.tensor_parallel, sp
            )
            if batch % mesh.shape["data"] != 0:
                # shrink the data axis to the largest divisor of the batch
                dp = mesh.shape["data"]
                while batch % dp:
                    dp -= 1
                status.warning(
                    f"batch {batch} not divisible by data axis "
                    f"{mesh.shape['data']}; using data={dp}"
                )
                mesh = make_mesh(dp, cfg.parallel.tensor_parallel, sp)
            data_sh = volume_sharding(mesh)
            status.info(f"mesh: {mesh}")
        train(
            cfg, ds_train, ds_val, x, y,
            mesh=mesh, data_sharding=data_sh,
            profile_dir=(
                cfg.env.this_runs_tensorboard_log_folder if args.profile else None
            ),
            max_steps=args.max_steps,
        )
        return

    if cfg.is_test:
        from gan_sr_wind_field_tpu.eval.test_loop import run_test

        run_test(cfg, ds_test, x, y, ema=args.test_ema)
        return

    if cfg.is_use or args.export or args.serve is not None:
        from gan_sr_wind_field_tpu.train import checkpoint as ckpt
        from gan_sr_wind_field_tpu.train.gan import WindFieldGAN

        gan = WindFieldGAN(cfg, x, y)
        g = cfg.gan_config
        patch = g.slice_size if g.enable_slicing else len(x)
        example = gan.init_state(
            jax.random.key(0),
            (1, patch // cfg.scale, patch // cfg.scale,
             g.number_of_z_layers, cfg.lr_num_channels),
            (1, patch, patch, g.number_of_z_layers, 3),
        )
        path = cfg.env.generator_load_path
        if path and path.endswith(".pth"):  # reference torch checkpoint
            from gan_sr_wind_field_tpu.utils.torch_import import (
                load_reference_checkpoint,
            )

            params_G, _, _ = load_reference_checkpoint(gan.G, path)
            # drop the EMA slot: under g_ema_decay>0 `example` carries a
            # copy of the RANDOM init there, and the EMA preference below
            # would serve that instead of the loaded weights
            state = example.replace(
                params_G=jax.tree.map(jax.numpy.asarray, params_G),
                params_G_ema=None,
            )
        elif path and path.endswith(".npz"):  # continuation pack
            from gan_sr_wind_field_tpu.train.continuation import (
                load_continuation,
            )

            pack = load_continuation(path)
            state = example.replace(
                params_G=jax.tree.map(jax.numpy.asarray, pack["params_G"]),
                params_G_ema=(
                    jax.tree.map(jax.numpy.asarray, pack["params_G_ema"])
                    if pack["params_G_ema"] is not None else None
                ),
            )
        elif path:
            state = ckpt.restore_checkpoint(path, example)
        else:
            state = example.replace(params_G_ema=None)
            if args.export or args.serve is not None:
                status.warning(
                    "no generator_load_path set — exporting/serving "
                    "freshly-initialized RANDOM weights"
                )
        if getattr(state, "params_G_ema", None) is not None and not args.no_ema:
            # EMA weights are the deployment weights (g_ema_decay > 0)
            state = state.replace(params_G=state.params_G_ema)
            status.info("using EMA generator weights for inference")
        if args.export:
            from gan_sr_wind_field_tpu.eval.export import export_generator

            header = export_generator(
                gan, state.params_G, args.export,
                norm_stats=getattr(ds_test, "stats", None),
            )
            status.info(
                f"exported generator -> {args.export} "
                f"(platforms {header['platforms']}, "
                f"lr_shape {header['lr_shape']})"
            )
        if cfg.is_use:
            from gan_sr_wind_field_tpu.eval.test_loop import run_use

            run_use(cfg, ds_test, x, y, state=state)
        if args.serve is not None:
            from gan_sr_wind_field_tpu.eval.serve import WindFieldSR
            from gan_sr_wind_field_tpu.eval.server import serve

            sr = WindFieldSR(
                gan, state.params_G,
                norm_stats=getattr(ds_test, "stats", None),
            )
            if args.serve_int8 > 0:
                import numpy as np

                rng_np = np.random.default_rng(0)
                n = min(args.serve_int8, len(ds_test))
                calib = np.stack(
                    [ds_test.get(i, rng_np)[0] for i in range(n)]
                )
                sr.quantize(calib)
                status.info(
                    f"int8 serving head calibrated over {n} test samples"
                )
            if args.serve_int8_trunk > 0:
                import numpy as np

                rng_np = np.random.default_rng(0)
                n = min(args.serve_int8_trunk, len(ds_test))
                calib = np.stack(
                    [ds_test.get(i, rng_np)[0] for i in range(n)]
                )
                sr.quantize_trunk(calib)
                status.info(
                    f"int8 serving trunk calibrated over {n} test samples"
                )
            if args.serve_warmup:
                from gan_sr_wind_field_tpu.eval.server import warmup

                sizes = [int(b) for b in args.serve_warmup.split(",")]
                warmup(
                    sr,
                    (patch // cfg.scale, patch // cfg.scale,
                     g.number_of_z_layers, cfg.lr_num_channels),
                    (patch, patch, g.number_of_z_layers, 1),
                    sizes, log=status,
                )
            lr_tile = patch // cfg.scale
            status.info(
                f"serving on 0.0.0.0:{args.serve} "
                f"(POST /v1/upscale[_physical|_tiled], GET /v1/health; "
                f"tile {lr_tile} LR px)"
            )
            allowed = None
            if args.serve_strict_shapes:
                allowed = [(lr_tile, lr_tile, g.number_of_z_layers,
                            cfg.lr_num_channels)]
                status.info(f"strict shapes: /v1/upscale pinned to "
                            f"{allowed}")
            serve(sr, host="0.0.0.0", port=args.serve, log=status,
                  block=True, tile=lr_tile, allowed_shapes=allowed)
        return

    print("nothing to do: pass --train, --test, --use, --download, "
          "or --param_search", file=sys.stderr)


if __name__ == "__main__":
    main()
