#!/usr/bin/env python
"""Export a compact committable continuation pack from a run checkpoint.

Usage:
    python scripts/export_continuation.py RUN_FOLDER [--ckpt CKPT_DIR]
        [--out PACK.npz] [--no-ema] [--fp32]

RUN_FOLDER must contain the run's `config.ini` snapshot (every run writes
one). The pack (train/continuation.py format, bf16 by default, ~100 MB for
the flagship G+D) is what gets COMMITTED so a training chain can survive a
VM recycle; resume the chain with

    generator_load_path = <pack.npz>   # in the next leg's [ENV]
    load_model_from_save = True

which warm-starts weights + `it` (LR/noise schedules continue; optimizer
moments reset — note it in the evidence doc).

No reference equivalent: the reference assumes a durable cluster
filesystem (config_cluster.ini:98-136); this replaces it with git.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("run_folder")
    ap.add_argument("--ckpt", default=None,
                    help="checkpoint dir (default: latest ckpt_* in run)")
    ap.add_argument("--out", default=None,
                    help="output .npz (default: <run>/continuation_<it>.npz)")
    ap.add_argument("--no-ema", action="store_true",
                    help="drop the EMA slot (halves G storage)")
    ap.add_argument("--fp32", action="store_true",
                    help="store float32 instead of bfloat16")
    args = ap.parse_args()

    # force CPU: packing is pure IO — do not touch the TPU tunnel
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from gan_sr_wind_field_tpu.config import Config
    from gan_sr_wind_field_tpu.train import checkpoint as ckpt
    from gan_sr_wind_field_tpu.train.continuation import pack_from_state
    from gan_sr_wind_field_tpu.train.gan import WindFieldGAN

    cfg_path = os.path.join(args.run_folder, "config.ini")
    cfg = Config.from_ini(cfg_path)
    path = args.ckpt or ckpt.latest_checkpoint(args.run_folder)
    if path is None:
        raise SystemExit(f"no ckpt_* under {args.run_folder}")

    g = cfg.gan_config
    # physics-grid coordinates only feed the loss — any monotone grid of
    # the right extent works for a restore-and-pack
    size = g.slice_size if g.enable_slicing else 128
    x = np.arange(size, dtype=np.float32)
    gan = WindFieldGAN(cfg, x, x)
    lr_shape = (1, size // cfg.scale, size // cfg.scale,
                g.number_of_z_layers, cfg.lr_num_channels)
    hr_shape = (1, size, size, g.number_of_z_layers, 3)
    example = gan.init_state(jax.random.key(0), lr_shape, hr_shape)
    state = ckpt.restore_checkpoint(path, example)

    it = int(state.it)
    out = args.out or os.path.join(args.run_folder, f"continuation_{it}.npz")
    pack_from_state(
        out, state, include_ema=not args.no_ema,
        extra_meta={
            "source_ckpt": os.path.abspath(path),
            "config": os.path.abspath(cfg_path),
            "name": cfg.name,
        },
    )
    if args.fp32:
        # re-pack in f32 (rare; default bf16 keeps packs committable)
        from gan_sr_wind_field_tpu.train.continuation import (
            save_continuation,
        )

        stats = state.batch_stats_D
        if stats is not None and not jax.tree_util.tree_leaves(stats):
            stats = None
        save_continuation(
            out, state.params_G, state.params_D, stats,
            None if args.no_ema else state.params_G_ema,
            it=it, store_dtype="float32",
        )
    mb = os.path.getsize(out) / 1e6
    print(f"wrote {out} ({mb:.1f} MB, it={it})")


if __name__ == "__main__":
    main()
