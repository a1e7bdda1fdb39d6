"""Offline run analysis — counterpart of the reference's plot_data.py
TensorBoard-log analysis (plot_data.py:341-767 via tbparse) and feature-map
extraction (plot_data.py:770-793).

Metric sources here are the `events.jsonl` streams every run writes (the
scalars also go to TensorBoard when available). mayavi 3D scenes are out of
scope on headless pods; field pickles keep the reference schema for offline
rendering with the original tooling.
"""

from __future__ import annotations

import json
import os
from collections import defaultdict
from typing import Dict, List, Optional, Sequence

import numpy as np


def read_events(log_dir: str) -> Dict[str, Dict[str, List]]:
    """events.jsonl → {tag/key: {'step': [...], 'value': [...]}}."""
    out: Dict[str, Dict[str, List]] = defaultdict(
        lambda: {"step": [], "value": []}
    )
    path = os.path.join(log_dir, "events.jsonl")
    with open(path) as f:
        for line in f:
            rec = json.loads(line)
            for k, v in rec["values"].items():
                key = f"{rec['tag']}/{k}"
                out[key]["step"].append(rec["step"])
                out[key]["value"].append(v)
    return dict(out)


def plot_metric_runs(
    run_dirs: Sequence[str],
    metric: str = "metrics/PSNR/val_PSNR",
    baseline_metric: Optional[str] = "metrics/PSNR/Trilinear_PSNR",
    labels: Optional[Sequence[str]] = None,
    ylim=None,
    out_path: Optional[str] = None,
):
    """Training-curve comparison across runs with the trilinear baseline as
    a dashed reference (the signature plot of the thesis analysis,
    plot_data.py:536-767)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(8, 5))
    baseline_drawn = False
    for i, run in enumerate(run_dirs):
        ev = read_events(run)
        if metric not in ev:
            continue
        label = labels[i] if labels else os.path.basename(run.rstrip("/"))
        ax.plot(ev[metric]["step"], ev[metric]["value"], label=label)
        if baseline_metric and not baseline_drawn and baseline_metric in ev:
            ax.plot(
                ev[baseline_metric]["step"], ev[baseline_metric]["value"],
                "k--", label="trilinear",
            )
            baseline_drawn = True
    ax.set_xlabel("iteration")
    ax.set_ylabel(metric.rsplit("/", 1)[-1])
    if ylim:
        ax.set_ylim(*ylim)
    ax.legend()
    ax.grid(alpha=0.3)
    if out_path:
        fig.savefig(out_path, dpi=150, bbox_inches="tight")
    return fig


def get_feature_maps(gan, params_G, lr, z, layer_filter: str = "RRDB0"):
    """Intermediate generator activations via flax capture_intermediates
    (replaces the reference's nn.Sequential slicing, plot_data.py:770-793)."""
    _, mods = gan.G.apply(
        {"params": params_G}, lr, z, train=False,
        capture_intermediates=lambda mdl, _: layer_filter in mdl.path[-1]
        if mdl.path else False,
    )
    feats = mods.get("intermediates", {})
    return feats


def patch_offset_distribution(n: int = 100000, full: int = 128,
                              patch: int = 64, seed: int = 0):
    """Beta(0.25,0.25) corner-biased offsets vs uniform — the demo histogram
    from plot_data.py:884-929."""
    rng = np.random.default_rng(seed)
    beta = np.round(rng.beta(0.25, 0.25, size=n) * (full - patch)).astype(int)
    uniform = rng.integers(0, full - patch + 1, size=n)
    return beta, uniform
