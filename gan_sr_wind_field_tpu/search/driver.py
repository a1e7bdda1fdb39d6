"""Hyperparameter search driver over the 5 physics-loss weights.

Replaces the reference's Ray Tune + Optuna + ASHA stack
(param_search.py:270-424) with a TPU-native design:

- the search space (log-uniform over gradient/divergence weights, uniform
  over pixel weight) and the 10 seeded starting points match the reference
  (param_search.py:284-296, 305-376),
- sampling is scrambled-Sobol-like quasi-random (low-discrepancy van der
  Corput per dimension) instead of Optuna TPE — deterministic and
  dependency-free,
- **every trial shares ONE compiled train step**: the searched weights are
  traced scalars, so switching trials costs nothing (the reference pays a
  full Ray actor + model build per trial),
- ASHA early stopping at iteration rungs (grace 1200, η=3) on validation
  PSNR, like the reference,
- trials run sequentially per process; across TPU slices, launch one driver
  per slice with different `slurm_array_id`-style shard index (trial i runs
  on shard i % n_shards), replacing the reference's Slurm array fan-out.
"""

from __future__ import annotations

import json
import logging
import os
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from gan_sr_wind_field_tpu.search.asha import ASHAScheduler
from gan_sr_wind_field_tpu.train.gan import WindFieldGAN

SEARCH_SPACE = {
    "gradient_xy": ("loguniform", 0.5, 32.0),
    "gradient_z": ("loguniform", 0.25, 16.0),
    "xy_divergence": ("loguniform", 0.25, 16.0),
    "divergence": ("loguniform", 0.25, 16.0),
    "pixel": ("uniform", 0.0, 1.0),
}

# the reference's 10 seeded starting points (param_search.py:305-376)
INITIAL_POINTS: List[Dict[str, float]] = [
    {"gradient_xy": 5.0, "gradient_z": 0.25, "xy_divergence": 1.25,
     "divergence": 0.25, "pixel": 0.15},
    {"gradient_xy": 1.0, "gradient_z": 0.25, "xy_divergence": 1.25,
     "divergence": 1.25, "pixel": 0.15},
    {"gradient_xy": 10.0, "gradient_z": 0.25, "xy_divergence": 2.5,
     "divergence": 0.25, "pixel": 0.25},
    {"gradient_xy": 1.0, "gradient_z": 0.25, "xy_divergence": 2.5,
     "divergence": 2.5, "pixel": 0.25},
    {"gradient_xy": 5.0, "gradient_z": 0.25, "xy_divergence": 1.25,
     "divergence": 2.5, "pixel": 0.2},
    {"gradient_xy": 2.5, "gradient_z": 1.0, "xy_divergence": 0.5,
     "divergence": 1.0, "pixel": 0.15},
    {"gradient_xy": 10.0, "gradient_z": 1.0, "xy_divergence": 0.5,
     "divergence": 1.0, "pixel": 0.2},
    {"gradient_xy": 2.5, "gradient_z": 5.0, "xy_divergence": 0.5,
     "divergence": 1.0, "pixel": 0.2},
    {"gradient_xy": 2.5, "gradient_z": 1.0, "xy_divergence": 2.5,
     "divergence": 1.0, "pixel": 0.2},
    {"gradient_xy": 2.5, "gradient_z": 1.0, "xy_divergence": 0.5,
     "divergence": 5.0, "pixel": 0.2},
]


def _van_der_corput(n: int, base: int) -> float:
    q, denom = 0.0, 1.0
    while n:
        denom *= base
        n, rem = divmod(n, base)
        q += rem / denom
    return q


def sample_point(index: int, seed: int = 0) -> Dict[str, float]:
    """Low-discrepancy quasi-random sample from SEARCH_SPACE."""
    primes = [2, 3, 5, 7, 11]
    rng = np.random.default_rng(seed)
    shifts = rng.random(len(primes))  # Cranley-Patterson rotation
    out = {}
    for dim, (name, (kind, lo, hi)) in enumerate(SEARCH_SPACE.items()):
        u = (_van_der_corput(index + 1, primes[dim]) + shifts[dim]) % 1.0
        if kind == "loguniform":
            out[name] = float(np.exp(np.log(lo) + u * (np.log(hi) - np.log(lo))))
        else:
            out[name] = float(lo + u * (hi - lo))
    return out


def point_to_weights(p: Dict[str, float]) -> Dict[str, jnp.ndarray]:
    return {
        "pix": jnp.float32(p["pixel"]),
        "gxy": jnp.float32(p["gradient_xy"]),
        "gz": jnp.float32(p["gradient_z"]),
        "div": jnp.float32(p["divergence"]),
        "xydiv": jnp.float32(p["xy_divergence"]),
    }


def run_trial(gan: WindFieldGAN, cfg, ds_train, ds_val, point, asha,
              trial_id: int, batch_size: int, status) -> Dict:
    """Train one trial under ASHA; returns its record (clone of the
    reference's stripped trial loop, param_search.py:28-267)."""
    weights = point_to_weights(point)
    rng_np = np.random.default_rng(cfg.env.fixed_seed + trial_id)
    probe_lr, probe_hr, _ = ds_train.get(0, rng_np)
    state = gan.init_state(
        jax.random.key(cfg.env.fixed_seed + trial_id),
        (batch_size,) + probe_lr.shape,
        (batch_size,) + probe_hr.shape,
    )

    rungs = set(asha.rung_iterations())
    it, best_psnr, last_psnr = 0, -np.inf, 0.0
    stopped = False
    niter = cfg.training.niter
    val_period = cfg.training.val_period

    device_iter = None
    if getattr(cfg, "device_resident_data", False) and jax.process_count() == 1:
        # zero steady-state H2D during trials (data/device_data.py); the
        # per-trial upload is seconds and the resident arrays free with
        # the iterator when the trial ends
        from gan_sr_wind_field_tpu.data.device_data import DeviceBatcher

        device_iter = iter(DeviceBatcher(
            ds_train, batch_size, seed=cfg.env.fixed_seed + trial_id,
        ))

    while it < niter and not stopped:
        for lr_b, hr_b, z_b in (
            device_iter if device_iter is not None
            else ds_train.batches(batch_size, rng_np, shuffle=True,
                                  epochs=1)
        ):
            if it >= niter or stopped:
                break
            it += 1
            state, _m = gan.train_step(
                state, lr_b, hr_b, z_b, augment=True, weights=weights
            )
            if it % val_period == 0 or it in rungs:
                psnrs = []
                # deterministic track: identical patch offsets every sweep,
                # so ASHA compares trials on a stable metric
                vrng = (
                    np.random.default_rng(cfg.env.fixed_seed)
                    if cfg.dataset_val and cfg.dataset_val.deterministic
                    else rng_np
                )
                for bi, (vlr, vhr, vz) in enumerate(
                    ds_val.batches(batch_size, vrng, shuffle=False,
                                   drop_remainder=False)
                ):
                    m, _bs = gan.val_step(
                        state, vlr, vhr, vz,
                        jax.random.fold_in(state.rng, bi), weights=weights,
                    )
                    psnrs.append(float(m["val_PSNR"]))
                last_psnr = float(np.mean(psnrs)) if psnrs else -np.inf
                best_psnr = max(best_psnr, last_psnr)
                if it in rungs and not asha.report(it, last_psnr):
                    status.info(
                        f"trial {trial_id}: ASHA stop at it {it} "
                        f"(PSNR {last_psnr:.3f})"
                    )
                    stopped = True

    return {"trial": trial_id, "point": point, "it": it,
            "PSNR": last_psnr, "best_PSNR": best_psnr,
            "stopped_early": stopped}


def param_search(cfg, ds_train, ds_val, x, y, num_samples: int = 250,
                 shard_index: int = 0, num_shards: int = 1,
                 out_path: Optional[str] = None,
                 grace_period: int = 1200, reduction_factor: int = 3):
    """Run the sweep; writes JSONL of trial records + best point summary.

    ``grace_period``/``reduction_factor`` default to the reference's ASHA
    settings (param_search.py:298-303); reduced-budget sweeps (e.g.
    grace 40, niter 400 — scripts/run_sweep_tpu.py) scale the rungs down
    so population-scale promotion/stopping is exercised in minutes.
    """
    status = logging.getLogger("status")
    if not (cfg.dataset_val and cfg.dataset_val.deterministic):
        status.warning(
            "param search on the quirk-parity val track: random val "
            "augmentation makes PSNR swing ~10 dB between sweeps; set "
            "[DATASETVAL] deterministic=true for stable ASHA decisions"
        )
    gan = WindFieldGAN(cfg, x, y)  # ONE compiled step for every trial
    batch_size = cfg.dataset_train.batch_size if cfg.dataset_train else 8

    run_folder = cfg.env.this_runs_folder or "."
    # sharded sweeps share rung state via per-shard JSONLs in the (shared)
    # run folder, so promotion decisions see the whole population like the
    # reference's single Ray head (param_search.py:298-303)
    asha = ASHAScheduler(
        max_t=cfg.training.niter,
        grace_period=grace_period,
        reduction_factor=reduction_factor,
        share_dir=run_folder if num_shards > 1 else None,
        shard_index=shard_index,
    )
    out_path = out_path or os.path.join(run_folder, "param_search.jsonl")
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)

    results = []
    with open(out_path, "a") as f:
        for i in range(num_samples):
            if i % num_shards != shard_index:
                continue
            point = (
                INITIAL_POINTS[i]
                if i < len(INITIAL_POINTS)
                else sample_point(i - len(INITIAL_POINTS),
                                  seed=cfg.env.fixed_seed)
            )
            status.info(f"trial {i}: {point}")
            rec = run_trial(gan, cfg, ds_train, ds_val, point, asha, i,
                            batch_size, status)
            results.append(rec)
            f.write(json.dumps(rec) + "\n")
            f.flush()

    best = max(results, key=lambda r: r["best_PSNR"]) if results else None
    if best:
        status.info(f"best trial: {best}")
        with open(os.path.join(run_folder, "param_search_best.json"), "w") as f:
            json.dump(best, f, indent=2)
    return results
