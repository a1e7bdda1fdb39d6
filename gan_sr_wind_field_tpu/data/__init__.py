"""Data acquisition, preprocessing, and input pipeline.

TPU-native counterpart of the reference's L1/L2 data layers
(download_data.py + process_data.py, SURVEY.md §1): downloader →
hourly-sample cache → normalization stats → chronological split →
``WindDataset`` (patch slicing + equivariant augmentation) → threaded
device prefetch. A synthetic analytic source (synthetic.py) replaces the
network for tests and smoke training.
"""

from __future__ import annotations

import logging
import os
from datetime import date

import numpy as np

from gan_sr_wind_field_tpu.data import files as dfiles
from gan_sr_wind_field_tpu.data.dataset import (
    WindDataset,
    aggregate_norm_stats,
    chronological_split,
)
from gan_sr_wind_field_tpu.data.synthetic import generate_synthetic_cache
from gan_sr_wind_field_tpu.data.transform import NormStats, reformat_sample

__all__ = [
    "WindDataset",
    "NormStats",
    "aggregate_norm_stats",
    "chronological_split",
    "filenames_from_dates",
    "generate_synthetic_cache",
    "preprocess",
    "reformat_sample",
]

filenames_from_dates = dfiles.filenames_from_dates


def preprocess(cfg, synthetic: bool = False, synthetic_hours: int = 48,
               synthetic_size: int = 64):
    """Build the three split datasets + coordinate axes from config.

    Counterpart of reference ``preprosess`` (process_data.py:497-639):
    → (dataset_train, dataset_test, dataset_validation, x, y). With
    ``synthetic`` the cache is generated analytically (no network).
    """
    log = logging.getLogger("status")
    g = cfg.gan_config
    root = cfg.env.data_root
    ratio = cfg.training.train_eval_test_ratio

    if synthetic:
        names, sub = generate_synthetic_cache(
            root,
            num_hours=synthetic_hours,
            nx=synthetic_size,
            ny=synthetic_size,
            nz=g.number_of_z_layers,
        )
    else:
        sub = f"bessaker_z{g.number_of_z_layers}"
        folder = dfiles.dataset_folder(root, sub)
        names = dfiles.existing(
            folder,
            dfiles.filenames_from_dates(
                date(*g.start_date), date(*g.end_date)
            ),
        )
        if not names:
            from gan_sr_wind_field_tpu.data.downloader import download_dataset

            log.info("sample cache empty — downloading HARMONIE-SIMRA data")
            names = download_dataset(
                root, date(*g.start_date), date(*g.end_date),
                number_of_z_layers=g.number_of_z_layers, subfolder=sub,
            )
        if not names:
            raise RuntimeError(
                "no valid samples in cache and download produced none; "
                "run `python run.py --download` or use --synthetic"
            )

    folder = dfiles.dataset_folder(root, sub)
    terrain, x, y = dfiles.read_static(
        folder, os.path.join(root, "full_dataset_files")
    )

    stats = aggregate_norm_stats(folder, names, ratio)
    if not os.path.isfile(dfiles.norm_factors_path(folder)):
        dfiles.write_norm_factors(folder, stats)

    train_names, test_names, val_names = chronological_split(names, ratio)
    interp_dir = dfiles.interp_cache_folder(root, sub)

    common = dict(
        stats=stats,
        x=x,
        y=y,
        terrain=terrain,
        coarseness_factor=cfg.scale,
        include_pressure=g.include_pressure,
        include_z_channel=g.include_z_channel,
        include_above_ground_channel=g.include_above_ground_channel,
        interpolate_z=g.interpolate_z,
        slice_size=g.slice_size,
        interp_cache_dir=interp_dir,
    )

    ds_train = WindDataset(
        folder, train_names,
        enable_slicing=g.enable_slicing,
        data_aug_rot=cfg.dataset_train.data_aug_rot if cfg.dataset_train else False,
        data_aug_flip=cfg.dataset_train.data_aug_flip if cfg.dataset_train else False,
        **common,
    )
    # test: full volumes, no augmentation (reference process_data.py:575-599)
    ds_test = WindDataset(
        folder, test_names, enable_slicing=False, is_test=True, **common
    )
    # deterministic val track disables augmentation (offsets are fixed by
    # the sweep RNG seed in train/loop.run_validation / search/driver)
    val_det = bool(cfg.dataset_val and cfg.dataset_val.deterministic)
    ds_val = WindDataset(
        folder, val_names,
        enable_slicing=g.enable_slicing,
        data_aug_rot=bool(cfg.dataset_val and cfg.dataset_val.data_aug_rot
                          and not val_det),
        data_aug_flip=bool(cfg.dataset_val and cfg.dataset_val.data_aug_flip
                           and not val_det),
        **common,
    )

    if g.enable_slicing:  # regular spacing — values irrelevant beyond dx
        x = x[: g.slice_size]
        y = y[: g.slice_size]
    return (
        ds_train,
        ds_test,
        ds_val,
        np.asarray(x, np.float32),
        np.asarray(y, np.float32),
    )
