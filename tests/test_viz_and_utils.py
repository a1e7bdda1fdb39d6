"""Viz/analysis + progress-bar + figure tests."""

import io
import json
import os

import numpy as np

from gan_sr_wind_field_tpu.utils.progress import DisplayBar
from gan_sr_wind_field_tpu.utils.tb import MetricsWriter
from gan_sr_wind_field_tpu.viz.analysis import (
    patch_offset_distribution,
    plot_metric_runs,
    read_events,
)
from gan_sr_wind_field_tpu.viz.plots import (
    create_comparison_figure,
    create_error_figure,
)


def _write_events(log_dir):
    w = MetricsWriter(str(log_dir), use_tensorboard=False)
    for it in (2, 4, 6):
        w.add_scalars(
            "metrics/PSNR", {"val_PSNR": 30 + it, "Trilinear_PSNR": 33.0}, it
        )
    w.close()


def test_read_events_and_plot(tmp_path):
    _write_events(tmp_path)
    ev = read_events(str(tmp_path))
    assert ev["metrics/PSNR/val_PSNR"]["step"] == [2, 4, 6]
    assert ev["metrics/PSNR/val_PSNR"]["value"][-1] == 36.0
    out = tmp_path / "plot.png"
    fig = plot_metric_runs(
        [str(tmp_path)], metric="metrics/PSNR/val_PSNR",
        baseline_metric="metrics/PSNR/Trilinear_PSNR", out_path=str(out),
    )
    assert out.exists() and fig is not None


def test_exp_comparison_plot_cli(tmp_path):
    """One command regenerates the thesis 33-41 dB band plot from two runs
    (plot_data.py:536-767 counterpart)."""
    from gan_sr_wind_field_tpu.viz.analysis import _main

    runs = []
    for name, base in (("runA", 30.0), ("runB", 27.0)):
        d = tmp_path / name
        w = MetricsWriter(str(d), use_tensorboard=False)
        for it in (2, 4, 6):
            w.add_scalars(
                "metrics/PSNR",
                {"val_PSNR": base + it, "Trilinear_PSNR": 33.0}, it,
            )
            w.add_scalars("G_loss/validation", {"total": 0.1 / it}, it)
        w.close()
        runs.append(str(d))

    out = tmp_path / "band.png"
    _main(runs + ["--out", str(out), "--highlight", runs[0]])
    assert out.exists() and out.stat().st_size > 0


def test_decomposed_val_loss_plot(tmp_path):
    """Per-term val-loss figure + optional grad-norm panel
    (plot_data.py:485-533 counterpart)."""
    from gan_sr_wind_field_tpu.viz.analysis import decomposed_val_loss_plot

    w = MetricsWriter(str(tmp_path), use_tensorboard=False)
    for it in (2, 4, 6):
        w.add_scalars(
            "G_loss/validation",
            {"pix": 0.05 / it, "xy_gradient": 0.02 / it,
             "divergence": 0.01 / it}, it,
        )
        w.add_scalars(
            "metrics/grad",
            {"G_grad_norm": 3.0 / it if it % 4 == 2 else 0.0}, it,
        )
    w.close()

    out = tmp_path / "decomposed.png"
    fig = decomposed_val_loss_plot(
        str(tmp_path), grad_norm=True, out_path=str(out)
    )
    assert out.exists() and out.stat().st_size > 0
    # two panels: losses + grad norm (zeros from D steps dropped)
    assert len(fig.axes) == 2

    fig2 = decomposed_val_loss_plot(str(tmp_path))
    assert len(fig2.axes) == 1


def test_patch_offset_distribution_corner_biased():
    beta, uniform = patch_offset_distribution(n=20000, full=128, patch=64)
    # Beta(0.25,0.25) mass concentrates at the corners vs uniform
    corners_beta = np.mean((beta < 8) | (beta > 56))
    corners_uni = np.mean((uniform < 8) | (uniform > 56))
    assert corners_beta > 2 * corners_uni
    assert beta.min() >= 0 and beta.max() <= 64


def test_figures(rng):
    hr = rng.standard_normal((16, 16, 4)).astype(np.float32)
    fig1 = create_comparison_figure(1, hr[::4, ::4], hr, hr * 0.9, hr * 1.1)
    fig2 = create_error_figure(1, hr, hr * 0.9, hr * 1.1, 0.1, 0.2)
    assert fig1.axes and fig2.axes


def _write_fields_pickle(path, rng, nz=4):
    import pickle

    hr = rng.standard_normal((3, 16, 16, nz)).astype(np.float32)
    fields = {
        "HR": hr,
        "SR": hr * 0.9,
        "TL": hr * 1.1,
        "LR": hr[:, ::4, ::4],
        "Z": np.abs(hr[0]) * 100.0,
    }
    with open(path, "wb") as f:
        pickle.dump(fields, f)


def test_create_2d_report(tmp_path, rng):
    from gan_sr_wind_field_tpu.viz.plots import create_2d_report

    pkl = tmp_path / "test_fields_demo.pkl"
    _write_fields_pickle(str(pkl), rng)
    out = tmp_path / "figures"
    written = create_2d_report(
        str(pkl), z_levels=(0, 2), components=("u", "w"),
        out_dir=str(out), scale=4,
    )
    # reference filename scheme: {comp}_{z}_scale{scale}[_error].png
    # (plot_data.py:1074-1120)
    expect = {
        f"{c}_{z}_scale4{s}.png"
        for c in ("u", "w") for z in (0, 2) for s in ("", "_error")
    }
    assert {os.path.basename(p) for p in written} == expect
    for p in written:
        assert os.path.getsize(p) > 0


def test_create_2d_report_cli_and_use_guard(tmp_path, rng):
    import pickle

    import pytest

    from gan_sr_wind_field_tpu.viz.plots import _main, create_2d_report

    pkl = tmp_path / "test_fields_demo.pkl"
    _write_fields_pickle(str(pkl), rng)
    out = tmp_path / "figs"
    _main([str(pkl), "--z", "1", "--components", "v", "--out", str(out),
           "--scale", "8"])
    assert (out / "v_1_scale8.png").exists()
    assert (out / "v_1_scale8_error.png").exists()

    # --use dumps lack HR/TL and must be rejected with a clear message
    use_pkl = tmp_path / "use_fields.pkl"
    with open(use_pkl, "wb") as f:
        pickle.dump({"LR": np.zeros((3, 4, 4, 2)),
                     "SR": np.zeros((3, 16, 16, 2))}, f)
    with pytest.raises(KeyError, match="full test-mode dump"):
        create_2d_report(str(use_pkl), out_dir=str(out))


def test_display_bar_renders():
    buf = io.StringIO()
    bar = DisplayBar(max_value=10, niter=20, stream=buf, min_interval=0.0)
    bar.update(1, 0, 1)
    bar.update(5, 0, 20)
    out = buf.getvalue()
    assert "it 20/20" in out and "ETA" in out


def test_exp_comparison_labels_map_to_highlighted(tmp_path):
    """labels map one-to-one onto the highlighted runs (only they are
    labelled) — one label for the last of three runs must not IndexError."""
    from gan_sr_wind_field_tpu.viz.analysis import exp_comparison_plot

    runs = []
    for i in range(3):
        d = tmp_path / f"run{i}"
        d.mkdir()
        with open(d / "events.jsonl", "w") as f:
            for step in (1, 2):
                f.write(json.dumps({
                    "tag": "metrics/PSNR", "step": step,
                    "values": {"val_PSNR": 30.0 + i + step},
                }) + "\n")
        runs.append(str(d))
    fig = exp_comparison_plot(runs, highlight=[runs[2]], labels=["best"],
                              band=(20, 40))
    texts = [t.get_text() for t in fig.axes[0].get_legend().get_texts()]
    assert texts == ["best"]
