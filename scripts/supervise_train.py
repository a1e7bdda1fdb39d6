#!/usr/bin/env python
"""Auto-resume training supervisor (elastic recovery, SURVEY.md §5).

    python scripts/supervise_train.py --cfg CFG.ini [run.py args...]
        [--max_restarts 10] [--backoff_s 60]

Launches ``python run.py --train <args>`` and relaunches it from the
newest checkpoint whenever it dies before reaching ``niter`` — the
companion to the in-process stall watchdog (`train/watchdog.py`,
``[TRAINING] stall_watchdog_s``): the watchdog turns a hung remote
runtime into a clean exit (graceful SIGTERM checkpoint, or hard exit 86
when the runtime is dead), and this supervisor brings the run back.
Measured need: two tunnel stalls in one night on the 30k evidence run
(docs/evidence/longrun30k.md).

Resume legs are generated configs: a copy of the original INI with
``load_model_from_save``/``resume_training_from_save`` = True and
``[ENV] state_load_path`` pointing at the newest ``ckpt_<it>`` across
this run name's folders (each leg gets its own timestamped run folder,
exactly the manual multi-leg procedure used for the evidence runs).

Reference counterpart: none — recovery there is manual restart with
``resume_training_from_save`` (reference train.py:90-102).
"""

import configparser
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def read_run_meta(cfg_path):
    """(name, niter, runs_dir) from an INI without building a Config."""
    p = configparser.ConfigParser()
    p.read(cfg_path)
    name = p.get("DEFAULT", "name")
    niter = p.getint("TRAINING", "niter")
    root = p.get("ENV", "root_path", fallback="./runs_root")
    runs = p.get("ENV", "runs_subpath", fallback="/runs").strip("/")
    return name, niter, os.path.join(root, runs)


def find_latest_ckpt(runs_dir, name):
    """Newest ``ckpt_<it>`` across every ``<name>_*`` run folder.

    Returns (path, it) or (None, 0)."""
    best, best_it = None, 0
    if not os.path.isdir(runs_dir):
        return None, 0
    for folder in os.listdir(runs_dir):
        if not (folder == name or folder.startswith(name + "_")):
            continue
        fp = os.path.join(runs_dir, folder)
        for entry in os.listdir(fp) if os.path.isdir(fp) else ():
            m = re.fullmatch(r"ckpt_(\d+)", entry)
            if m and int(m.group(1)) >= best_it:
                best, best_it = os.path.join(fp, entry), int(m.group(1))
    return best, best_it


def write_resume_cfg(cfg_path, ckpt_path, out_path):
    """Copy of ``cfg_path`` flipped into a resume leg from ``ckpt_path``."""
    p = configparser.ConfigParser()
    p.read(cfg_path)
    p["DEFAULT"]["load_model_from_save"] = "True"
    if not p.has_section("ENV"):
        p.add_section("ENV")
    p["ENV"]["state_load_path"] = os.path.abspath(ckpt_path)
    if not p.has_section("TRAINING"):
        p.add_section("TRAINING")
    p["TRAINING"]["resume_training_from_save"] = "True"
    with open(out_path, "w") as f:
        p.write(f)
    return out_path


def supervise(cfg_path, extra_args, max_restarts=10, backoff_s=60,
              runner=None, log=print):
    """Run legs until ``niter`` is reached; returns the leg summaries."""
    name, niter, runs_dir = read_run_meta(cfg_path)
    legs = []
    leg_cfg = cfg_path
    for leg in range(max_restarts + 1):
        cmd = runner or [sys.executable, "run.py", "--train"]
        cmd = cmd + ["--cfg", leg_cfg] + extra_args
        log(f"[supervisor] leg {leg}: {' '.join(cmd)}")
        t0 = time.time()
        rc = subprocess.call(cmd, cwd=REPO)
        ckpt, it = find_latest_ckpt(runs_dir, name)
        legs.append({"leg": leg, "rc": rc, "reached_it": it,
                     "wall_s": round(time.time() - t0, 1)})
        log(f"[supervisor] leg {leg} exited rc={rc}, latest ckpt it={it}")
        if it >= niter:
            log(f"[supervisor] target niter={niter} reached")
            break
        if ckpt is None:
            # exit 86 = the stall watchdog's hard exit (train/watchdog.py
            # STALL_EXIT_CODE): the runtime died, not the config — a
            # from-scratch relaunch is safe and counted against
            # max_restarts. rc 0 short of niter with no checkpoint is the
            # watchdog's GRACEFUL startup-deadline path (SIGTERM before
            # the first save exits cleanly at it 0) — same treatment.
            # Any other rc with no checkpoint is likely a real error that
            # would just crash-loop; give up.
            if rc in (86, 0):
                log("[supervisor] stall death before the first checkpoint "
                    "— relaunching from scratch")
                leg_cfg = cfg_path
                time.sleep(backoff_s)
                continue
            log("[supervisor] no checkpoint to resume from — giving up "
                "(died before the first save_model_period)")
            break
        if leg == max_restarts:
            log("[supervisor] max_restarts exhausted")
            break
        leg_cfg = write_resume_cfg(
            cfg_path, ckpt,
            os.path.join(runs_dir, f"{name}_resume_leg{leg + 1}.ini"),
        )
        log(f"[supervisor] backing off {backoff_s}s, then resuming "
            f"from {ckpt}")
        time.sleep(backoff_s)
    return legs


def main():
    argv = sys.argv[1:]

    def pop(flag, default, cast):
        if flag in argv:
            i = argv.index(flag)
            val = cast(argv[i + 1])
            del argv[i:i + 2]
            return val
        return default

    max_restarts = pop("--max_restarts", 10, int)
    backoff_s = pop("--backoff_s", 60, float)
    cfg = pop("--cfg", None, str)
    if cfg is None:
        sys.exit("--cfg is required")
    legs = supervise(cfg, argv, max_restarts=max_restarts,
                     backoff_s=backoff_s)
    ok = legs and legs[-1]["reached_it"] >= read_run_meta(cfg)[1]
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
