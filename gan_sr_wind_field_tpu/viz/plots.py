"""Validation/inspection figures.

Matplotlib counterparts of the reference's TB figures
(train.py:383-555: 2×2 LR/HR/SR/TL comparison and 2×3 error panels).
mayavi 3D scenes (plot_data.py) are out of scope for headless TPU pods; the
pickled field dumps keep the same schema so the thesis plots can be
reproduced offline.
"""

from __future__ import annotations

import numpy as np


def create_comparison_figure(z_index, lr2d, hr2d, sr2d, tl2d):
    """2×2 panel of one z-slice of a wind component: LR/HR/TL/SR."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(2, 2, figsize=(8, 7))
    vmin = float(np.min(hr2d[:, :, z_index]))
    vmax = float(np.max(hr2d[:, :, z_index]))
    panels = [
        (axes[0, 0], lr2d, "LR"),
        (axes[0, 1], hr2d, "HR"),
        (axes[1, 0], tl2d, "TL"),
        (axes[1, 1], sr2d, "SR"),
    ]
    for ax, arr, title in panels:
        zi = min(z_index, arr.shape[2] - 1)
        ax.pcolormesh(arr[:, :, zi], vmin=vmin, vmax=vmax, cmap="viridis")
        ax.set_title(title)
    fig.subplots_adjust(hspace=0.3)
    sm = plt.cm.ScalarMappable(cmap="viridis")
    sm.set_clim(vmin=vmin, vmax=vmax)
    fig.colorbar(sm, ax=axes)
    return fig


def create_error_figure(z_index, hr2d, sr2d, tl2d, sr_err, tl_err):
    """2×3 panel: signed error / field / absolute error for SR and TL."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(2, 3, figsize=(12, 6), sharex=True, sharey=True)
    hs = hr2d[:, :, z_index]
    for row, (field, err_val, name) in enumerate(
        [(sr2d[:, :, z_index], sr_err, "SR"), (tl2d[:, :, z_index], tl_err, "TL")]
    ):
        axes[row, 0].pcolormesh(field - hs, cmap="coolwarm")
        axes[row, 0].set_title(f"Error {name}-HR (m/s)")
        axes[row, 1].pcolormesh(field, cmap="viridis")
        axes[row, 1].set_title(f"{name}, avg error: {round(float(err_val), 3)} m/s")
        axes[row, 2].pcolormesh(np.abs(hs - field), cmap="jet")
        axes[row, 2].set_title(f"{name} Absolute Error (m/s)")
    fig.subplots_adjust(hspace=0.2)
    return fig
