"""3D viz + VTK export tests (reference plot_data.py:95-157,951-972
equivalents, headless)."""

import numpy as np

from gan_sr_wind_field_tpu.viz.field3d import (
    export_vtk_structured_grid,
    plot_field_3d,
    plot_scalar_3d,
)


def _field(rng, nx=8, ny=8, nz=4):
    x = np.arange(nx, dtype=np.float32) * 150.0
    y = np.arange(ny, dtype=np.float32) * 150.0
    terrain = 50.0 * rng.random((nx, ny)).astype(np.float32)
    z = terrain[:, :, None] + np.cumsum(
        np.full((nx, ny, nz), 12.0, np.float32), axis=-1
    )
    uvw = rng.standard_normal((nx, ny, nz, 3)).astype(np.float32)
    return x, y, z, terrain, uvw


def test_plot_field_3d_figure(rng):
    x, y, z, terrain, uvw = _field(rng)
    fig = plot_field_3d(x, y, z, uvw, terrain=terrain, stride=2)
    assert fig.axes  # figure with a populated 3D axes
    import matplotlib.pyplot as plt

    plt.close(fig)


def test_plot_scalar_3d_figure(rng):
    x, y, z, _, uvw = _field(rng)
    fig = plot_scalar_3d(x, y, z, np.linalg.norm(uvw, axis=-1))
    assert fig.axes
    import matplotlib.pyplot as plt

    plt.close(fig)


def test_vtk_export_roundtrip(tmp_path, rng):
    x, y, z, _, uvw = _field(rng, 4, 3, 2)
    path = export_vtk_structured_grid(
        str(tmp_path / "field"),
        x, y, z,
        vectors={"wind": uvw},
        scalars={"speed": np.linalg.norm(uvw, axis=-1)},
    )
    text = open(path).read()
    assert "DATASET STRUCTURED_GRID" in text
    assert "DIMENSIONS 4 3 2" in text
    assert "VECTORS wind float" in text
    assert "SCALARS speed float 1" in text

    # parse the points back: x must vary fastest, z slowest
    lines = text.splitlines()
    i0 = next(i for i, l in enumerate(lines) if l.startswith("POINTS")) + 1
    npts = 4 * 3 * 2
    pts = np.loadtxt(lines[i0 : i0 + npts])
    assert pts.shape == (npts, 3)
    np.testing.assert_allclose(pts[:4, 0], x)  # first row: x sweep
    np.testing.assert_allclose(pts[0, 2], z[0, 0, 0], rtol=1e-5)
    np.testing.assert_allclose(pts[-1, 2], z[-1, -1, -1], rtol=1e-5)

    # vectors section preserves the component values in point order
    iv = next(i for i, l in enumerate(lines) if l.startswith("VECTORS")) + 1
    vec = np.loadtxt(lines[iv : iv + npts])
    np.testing.assert_allclose(vec[0], uvw[0, 0, 0], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(vec[1], uvw[1, 0, 0], rtol=1e-5, atol=1e-6)
