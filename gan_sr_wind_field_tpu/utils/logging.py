"""Run loggers: 'status' (human-readable progress) and 'train' (loss lines).

Mirrors the reference's two-logger setup (run.py:223-255) without the
global in-memory status_logs buffer (tools/loggingclass.py) — modules log
directly; JAX has no cross-object mutable logging needs.
"""

from __future__ import annotations

import logging
import os
import sys


def setup_loggers(log_dir: str, also_log_to_terminal: bool = True,
                  level: int = logging.INFO):
    os.makedirs(log_dir, exist_ok=True)
    fmt = logging.Formatter("%(asctime)s %(levelname)s: %(message)s")

    status = logging.getLogger("status")
    status.setLevel(level)
    status.handlers.clear()
    fh = logging.FileHandler(os.path.join(log_dir, "status.log"))
    fh.setFormatter(fmt)
    status.addHandler(fh)
    if also_log_to_terminal:
        sh = logging.StreamHandler(sys.stdout)
        sh.setFormatter(fmt)
        status.addHandler(sh)

    train = logging.getLogger("train")
    train.setLevel(level)
    train.handlers.clear()
    th = logging.FileHandler(os.path.join(log_dir, "train.log"))
    th.setFormatter(logging.Formatter("%(message)s"))
    train.addHandler(th)
    return status, train
