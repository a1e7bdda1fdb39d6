"""Model evaluation ("test") and inference ("use") loops.

Counterpart of reference test.py:22-374 with the same CSV schema and field
pickle layout:

- per-run `test_output/{name}____metrics.csv`:
  field, PSNR, PSNR_trilinear, relative_error, pix, trilinear_pix,
  relative_error_trilinear, average wind speed (+old_pix columns)
- appended `test_output/averages.csv` row per run,
- `fields/test_fields_{name}.pkl` dumps of HR/SR/TL/LR/Z (+raw-grid track),
- optional reverse-z-interpolation metric track when `interpolate_z`
  (metrics recomputed on the raw terrain-following grid).

Metric semantics match test.py:334-374: `pix` is the mean wind-vector error
*length* in m/s, `relative_error` is mean error length / mean HR length
(ratio of means), `old_pix` is plain L1 × UVW_MAX.
"""

from __future__ import annotations

import logging
import os
import pickle
from typing import Optional

import jax
import numpy as np

from gan_sr_wind_field_tpu.data.zinterp import reverse_interpolate_z_columns
from gan_sr_wind_field_tpu.ops.metrics import psnr as psnr_fn
from gan_sr_wind_field_tpu.ops.resize import upsample_trilinear_xy
from gan_sr_wind_field_tpu.train import checkpoint as ckpt
from gan_sr_wind_field_tpu.train.gan import WindFieldGAN

METRIC_HEADER = (
    "field, PSNR, PSNR_trilinear, relative_error, pix, trilinear_pix, "
    "relative_error_trilinear, average wind speed, old_pix, old_pix_trilinear\n"
)
AVG_HEADER = (
    "Name, Average PSNR, Average PSNR trilinear, Average pix, "
    "Average pix trilinear, Average old pix, Average old pix trilinear\n"
)


def field_metrics(hr, sr, tl, uvw_max):
    """All scalar metrics for one field; channel-last (X,Y,Z,3) arrays."""
    hr = np.asarray(hr, np.float64)
    sr = np.asarray(sr, np.float64)
    tl = np.asarray(tl, np.float64)
    psnr = float(psnr_fn(hr[None], sr[None]))
    psnr_tl = float(psnr_fn(hr[None], tl[None]))
    err_len = np.sqrt(np.sum((hr - sr) ** 2, axis=-1))
    tl_err_len = np.sqrt(np.sum((hr - tl) ** 2, axis=-1))
    hr_len = np.sqrt(np.sum(hr**2, axis=-1))
    mean_err = float(np.mean(err_len))
    mean_tl_err = float(np.mean(tl_err_len))
    mean_hr = float(np.mean(hr_len))
    return {
        "PSNR": psnr,
        "PSNR_trilinear": psnr_tl,
        "relative_error": mean_err / mean_hr,
        "pix": mean_err * uvw_max,
        "trilinear_pix": mean_tl_err * uvw_max,
        "relative_error_trilinear": mean_tl_err / mean_hr,
        "average_wind_speed": mean_hr * uvw_max,
        "old_pix": float(np.mean(np.abs(hr - sr))) * uvw_max,
        "old_pix_trilinear": float(np.mean(np.abs(hr - tl))) * uvw_max,
    }


def _write_metric_row(f, name, m):
    f.write(
        f"{name},{m['PSNR']},{m['PSNR_trilinear']},{m['relative_error']},"
        f"{m['pix']},{m['trilinear_pix']}, {m['relative_error_trilinear']}, "
        f"{m['average_wind_speed']}, {m['old_pix']}, {m['old_pix_trilinear']}\n"
    )


def run_test(cfg, dataset_test, x, y, state=None,
             output_root: str = "./test_output",
             log_period: Optional[int] = None,
             ema: bool = False):
    """Evaluate the generator over the test split; write CSVs + field dumps.

    With ``ema=True`` the checkpoint's EMA slot (``params_G_ema``,
    ``g_ema_decay > 0``) is evaluated instead of the raw generator — the
    deployment weights ``--use``/``--export``/``--serve`` would ship — and
    all outputs carry an ``_ema`` name suffix so raw and EMA rows coexist
    in ``averages.csv``.

    Returns the dict of run-average metrics.
    """
    status = logging.getLogger("status")
    gan = WindFieldGAN(cfg, x, y)

    if state is None:
        run_folder = cfg.env.this_runs_folder or "."
        path = cfg.env.generator_load_path or ckpt.latest_checkpoint(run_folder)
        if path is None:
            raise FileNotFoundError(
                "no checkpoint found; set env.generator_load_path"
            )
        # the restore example must use the TRAINING geometry (D's classifier
        # shape depends on the training patch size; the checkpoint was saved
        # with it) — G itself is size-agnostic and evaluates full volumes
        g = cfg.gan_config
        patch = g.slice_size if g.enable_slicing else len(x)
        lr_shape = (1, patch // cfg.scale, patch // cfg.scale,
                    g.number_of_z_layers, cfg.lr_num_channels)
        hr_shape = (1, patch, patch, g.number_of_z_layers, 3)
        example = gan.init_state(jax.random.key(0), lr_shape, hr_shape)
        if path.endswith(".pth"):  # reference torch checkpoint migration
            import jax.numpy as jnp

            from gan_sr_wind_field_tpu.utils.torch_import import (
                load_reference_checkpoint,
            )

            params_G, _, _ = load_reference_checkpoint(gan.G, path)
            state = example.replace(
                params_G=jax.tree.map(jnp.asarray, params_G)
            )
        elif path.endswith(".npz"):  # continuation pack
            import jax.numpy as jnp

            from gan_sr_wind_field_tpu.train.continuation import (
                load_continuation,
            )

            pack = load_continuation(path)
            state = example.replace(
                params_G=jax.tree.map(jnp.asarray, pack["params_G"]),
                params_G_ema=(
                    jax.tree.map(jnp.asarray, pack["params_G_ema"])
                    if pack["params_G_ema"] is not None else None
                ),
            )
        else:
            state = ckpt.restore_checkpoint(path, example)
        status.info(f"loaded generator from {path}")

    if ema:
        if getattr(state, "params_G_ema", None) is None:
            raise ValueError(
                "ema=True but the checkpoint carries no EMA slot "
                "(train with g_ema_decay > 0)"
            )
        state = state.replace(params_G=state.params_G_ema)
        status.info("evaluating the EMA generator slot")

    run_name = f"{cfg.name}_ema" if ema else cfg.name

    os.makedirs(output_root, exist_ok=True)
    run_folder = cfg.env.this_runs_folder or output_root
    fields_dir = os.path.join(run_folder, "fields")
    os.makedirs(fields_dir, exist_ok=True)

    avg_path = os.path.join(output_root, "averages.csv")
    if not os.path.exists(avg_path):
        with open(avg_path, "w") as f:
            f.write(AVG_HEADER)

    metrics_path = os.path.join(output_root, f"{run_name}____metrics.csv")
    sums = {}
    sums_ri = {}
    n = 0
    log_period = log_period or max(1, cfg.training.log_period)

    with open(metrics_path, "w") as mf:
        mf.write(METRIC_HEADER)
        rif = None
        if cfg.gan_config.interpolate_z:
            ri_path = os.path.join(
                output_root, f"{run_name}____metrics_reverse_interpolate.csv"
            )
            rif = open(ri_path, "w")
            rif.write(METRIC_HEADER)

        rng_np = np.random.default_rng(0)
        for idx in range(len(dataset_test)):
            lr, hr, z, name, hr_raw, z_raw = dataset_test.get(idx, rng_np)
            sr = np.asarray(
                gan.generate(state.params_G, lr[None], z[None])
            )[0]
            tl = np.asarray(
                upsample_trilinear_xy(lr[None, ..., :3], cfg.scale)
            )[0]
            m = field_metrics(hr[..., :3], sr, tl, dataset_test.stats.uvw_max)
            _write_metric_row(mf, name, m)
            for k, v in m.items():
                sums[k] = sums.get(k, 0.0) + v
            n += 1

            sr_orig = None
            if rif is not None and hr_raw is not None:
                # reverse z-interp: map SR/TL back to the raw per-column grid
                # (reference test.py:160-213)
                zcols_raw = z_raw[..., 0]
                zcols_interp = z[..., 0]
                sr_orig = np.stack(
                    [
                        reverse_interpolate_z_columns(
                            sr[..., c], zcols_raw, zcols_interp
                        )
                        for c in range(3)
                    ],
                    axis=-1,
                )
                tl_orig = np.stack(
                    [
                        reverse_interpolate_z_columns(
                            tl[..., c], zcols_raw, zcols_interp
                        )
                        for c in range(3)
                    ],
                    axis=-1,
                )
                m_ri = field_metrics(
                    hr_raw[..., :3], sr_orig, tl_orig,
                    dataset_test.stats.uvw_max,
                )
                _write_metric_row(rif, name, m_ri)
                for k, v in m_ri.items():
                    sums_ri[k] = sums_ri.get(k, 0.0) + v

            if idx % log_period == 0:
                fields = {
                    "HR": np.moveaxis(hr[..., :3], -1, 0),
                    "SR": np.moveaxis(sr, -1, 0),
                    "TL": np.moveaxis(tl, -1, 0),
                    "LR": np.moveaxis(lr, -1, 0),
                    "Z": z[..., 0],
                }
                if hr_raw is not None:
                    fields["HR_orig"] = np.moveaxis(hr_raw[..., :3], -1, 0)
                    fields["Z_orig"] = z_raw[..., 0]
                    if sr_orig is not None:
                        fields["SR_orig"] = np.moveaxis(sr_orig, -1, 0)
                with open(
                    os.path.join(fields_dir, f"test_fields_{name}.pkl"), "wb"
                ) as ff:
                    pickle.dump(fields, ff)
        if rif is not None:
            rif.close()

    avgs = {k: v / max(n, 1) for k, v in sums.items()}
    with open(avg_path, "a") as f:
        f.write(
            f"{run_name}, {avgs['PSNR']}, {avgs['PSNR_trilinear']}, "
            f"{avgs['pix']}, {avgs['trilinear_pix']}, {avgs['old_pix']}, "
            f"{avgs['old_pix_trilinear']}\n"
        )
    status.info(f"test averages: {avgs}")
    if sums_ri:
        avgs["reverse_interpolate"] = {
            k: v / max(n, 1) for k, v in sums_ri.items()
        }
    return avgs


def run_use(cfg, dataset_test, x, y, state=None):
    """SR-only inference dump for every test field (reference --use path,
    test.py:106-121 — implemented without the reference's missing-Z bug)."""
    gan = WindFieldGAN(cfg, x, y)
    if state is None:
        raise ValueError("run_use requires a restored state")
    run_folder = cfg.env.this_runs_folder or "."
    fields_dir = os.path.join(run_folder, "fields")
    os.makedirs(fields_dir, exist_ok=True)
    rng_np = np.random.default_rng(0)
    for idx in range(len(dataset_test)):
        lr, _hr, z, name, _, _ = dataset_test.get(idx, rng_np)
        sr = np.asarray(gan.generate(state.params_G, lr[None], z[None]))[0]
        with open(
            os.path.join(fields_dir, f"test_fields_{name}.pkl"), "wb"
        ) as f:
            pickle.dump(
                {"LR": np.moveaxis(lr, -1, 0), "SR": np.moveaxis(sr, -1, 0)}, f
            )
