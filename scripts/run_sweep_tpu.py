#!/usr/bin/env python
"""Population-scale ASHA sweep on real TPU (VERDICT r2 weak 4).

    python scripts/run_sweep_tpu.py [--trials 24] [--niter 400] [--grace 40]

Runs the REAL search space (search/driver.py — the reference's 5
physics-loss weights, 10 seeded points + quasi-random tail) over the
full cluster-geometry model on synthetic data, with reduced ASHA rungs
(grace 40, eta 3, niter 400 -> rungs at 40/120/360) so population-scale
promotion/stopping happens in minutes. The sweep is sharded 2 ways
through the cross-shard rung JSONLs (both shards in one process, shared
run folder — shard 1's ASHA decisions consume shard 0's rung records,
the same mechanism a multi-host sweep uses).

Evidence written to the run folder:
  param_search.jsonl        one record per trial (it reached, PSNR, stop)
  param_search_best.json    best point summary
  sweep_summary.json        stop counts, compile events per trial (the
                            zero-recompiles-across-trials claim), timings
"""

import json
import logging
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import setup_compile_cache  # noqa: E402


class _EventTap(logging.Handler):
    """Collect (t, message-head) from a logger tree."""

    def __init__(self, match):
        super().__init__(level=logging.DEBUG)
        self.match = match
        self.events = []

    def emit(self, record):
        msg = record.getMessage()
        if self.match in msg:
            self.events.append((time.time(), msg[:120]))


def _arg(name, default):
    return (int(sys.argv[sys.argv.index(name) + 1])
            if name in sys.argv else default)


def main():
    trials = _arg("--trials", 24)
    niter = _arg("--niter", 400)
    grace = _arg("--grace", 40)
    ini = (sys.argv[sys.argv.index("--cfg") + 1]
           if "--cfg" in sys.argv else "configs/cluster.ini")

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    os.chdir(root)
    setup_compile_cache()

    import jax

    if os.environ.get("WINDSR_PLATFORM"):  # CPU mechanics dry-run
        jax.config.update("jax_platforms", os.environ["WINDSR_PLATFORM"])

    from gan_sr_wind_field_tpu.config import Config
    from gan_sr_wind_field_tpu.data import preprocess
    from gan_sr_wind_field_tpu.search.driver import param_search
    from gan_sr_wind_field_tpu.utils.logging import setup_loggers

    cfg = Config.from_ini(os.path.join(root, ini))
    t = cfg.training
    t.niter = niter
    t.val_period = 200
    cfg.dataset_val.deterministic = True
    # zero steady-state H2D during trials — over the tunnel the host-fed
    # path runs ~6x slower end to end (docs/PERF.md input pipeline).
    # Defaulted ON only when the sweep config didn't set the key itself;
    # --host_fed forces the host pipeline (e.g. to reproduce a host-fed
    # sweep or exercise epoch-permutation semantics).
    import configparser

    raw = configparser.ConfigParser()
    raw.read(os.path.join(root, ini))
    ini_sets_resident = any(
        raw.has_option(s, "device_resident_data")
        for s in (raw.sections() + [raw.default_section])
    )
    if "--host_fed" in sys.argv:
        cfg.device_resident_data = False
    elif not ini_sets_resident:
        cfg.device_resident_data = True
    run_folder = os.path.join(root, "runs_root", "runs",
                              f"sweep_tpu_{trials}x{niter}")
    os.makedirs(run_folder, exist_ok=True)
    cfg.env.this_runs_folder = run_folder
    cfg.env.data_root = os.path.join(root, "data")
    setup_loggers(os.path.join(run_folder, "log"),
                  also_log_to_terminal=True)

    # count XLA compiles: >0 only for the first trial of each shard
    # (every trial shares ONE compiled step — weights are traced scalars)
    jax.config.update("jax_log_compiles", True)
    compile_tap = _EventTap("Compiling")
    logging.getLogger("jax").addHandler(compile_tap)
    logging.getLogger("jax").setLevel(logging.DEBUG)
    trial_tap = _EventTap("trial")
    logging.getLogger("status").addHandler(trial_tap)

    print(f"devices: {jax.devices()}", flush=True)
    ds_train, _, ds_val, x, y = preprocess(
        cfg, synthetic=True, synthetic_hours=240, synthetic_size=128
    )

    t0 = time.time()
    results = []
    for shard in (0, 1):
        results += param_search(
            cfg, ds_train, ds_val, x, y, num_samples=trials,
            shard_index=shard, num_shards=2,
            grace_period=grace, reduction_factor=3,
        )

    # compiles per trial: bucket compile events by the trial-start times.
    # init_state re-jits a fresh <lambda> per trial (tiny, persistent-cache
    # hits) — the zero-recompile claim is about the SHARED TRAIN/VAL STEP,
    # so lambdas are reported separately.
    starts = [ev[0] for ev in trial_tap.events if ": {" in ev[1]]
    per_trial_step, per_trial_init = [], []
    for i, s in enumerate(starts):
        e = starts[i + 1] if i + 1 < len(starts) else time.time()
        win = [m for ct, m in compile_tap.events if s <= ct < e]
        per_trial_init.append(sum(1 for m in win if "lambda" in m))
        # the SHARED train/val step only — each trial also jits its own
        # tiny device-data slicer (jit(<unknown>) over the resident
        # volumes) and misc broadcast lambdas, which are not step
        # recompiles
        per_trial_step.append(sum(
            1 for m in win if "_train_step" in m or "_val_step" in m
        ))
    stopped = sum(1 for r in results if r.get("stopped_early"))
    first_of_shard = {0, len(starts) // 2}
    summary = {
        "trials": len(results),
        "stopped_early": stopped,
        "finished_full": len(results) - stopped,
        "grace": grace, "niter": niter,
        "wall_s": round(time.time() - t0, 1),
        "compiles_total": len(compile_tap.events),
        "step_compiles_per_trial": per_trial_step,
        "init_lambda_compiles_per_trial": per_trial_init,
        "zero_step_recompiles_after_first_trial_per_shard": all(
            c == 0 for j, c in enumerate(per_trial_step)
            if j not in first_of_shard
        ),
        "best": max(results, key=lambda r: r["best_PSNR"])
        if results else None,
    }
    with open(os.path.join(run_folder, "sweep_summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
