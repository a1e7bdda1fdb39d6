"""End-to-end downloader test over a locally synthesized .nc file.

Covers the full ``download_dataset`` path (download_data.py:160-255,403-481
in the reference): netCDF open, static extraction, transpose/crop/z-reverse,
hourly split, validity filter + filtered ledger, missing-remote ledger, max
stats, and the no-rework fast path on a second call. No network: the one
"remote" file is pre-seeded into the raw dir and ``urlretrieve`` is
monkeypatched to fail for the other.
"""

import os
from datetime import date

import numpy as np
import pytest

from gan_sr_wind_field_tpu.data import downloader, files as dfiles

pytestmark = pytest.mark.slow  # multi-minute integration tier (VERDICT r2 weak 5)

NX_RAW, NY_RAW, NZ_RAW, NT = 12, 11, 5, 13
NZ = 3  # number_of_z_layers under test


def _write_fake_nc(path: str, nx: int = NX_RAW, ny: int = NY_RAW,
                   nz_raw: int = NZ_RAW, nt: int = NT,
                   poison_hour: int = 5, seed: int = 0) -> np.ndarray:
    """Write a netCDF3 sim file in the raw (t, z, x, y) layout the
    downloader expects. Returns the raw w field for later checks."""
    from scipy.io import netcdf_file

    rng = np.random.default_rng(seed)
    shape = (nt, nz_raw, nx, ny)
    winds = {
        "x_wind_ml": rng.uniform(-5, 5, shape),
        "y_wind_ml": rng.uniform(-5, 5, shape),
        "upward_air_velocity_ml": rng.uniform(-2, 2, shape),
    }
    if poison_hour is not None:
        # poison one in-crop voxel of that hour so the sample gets filtered
        # (raw z index 2 survives the reverse+slice(1, 1+NZ) crop)
        winds["upward_air_velocity_ml"][poison_hour, 2, 5, 5] = np.nan
    # geopotential height = raw z index, so the test can assert the
    # ground-first reversal and the slice(1, 1+nz) crop exactly
    gph = np.broadcast_to(
        np.arange(nz_raw, dtype=float)[None, :, None, None], shape
    ).copy()
    press = rng.uniform(9e4, 1.1e5, shape)

    f = netcdf_file(path, "w")
    f.createDimension("time", nt)
    f.createDimension("z", nz_raw)
    f.createDimension("x", nx)
    f.createDimension("y", ny)
    for name, arr in {
        **winds,
        "geopotential_height_ml": gph,
        "air_pressure_ml": press,
    }.items():
        v = f.createVariable(name, "d", ("time", "z", "x", "y"))
        v[:] = arr
    vx = f.createVariable("x", "d", ("x",))
    vx[:] = np.arange(nx, dtype=float)
    vy = f.createVariable("y", "d", ("y",))
    vy[:] = np.arange(ny, dtype=float)
    vt = f.createVariable("surface_altitude", "d", ("x", "y"))
    vt[:] = rng.uniform(0, 50, (nx, ny))
    f.close()
    return winds["upward_air_velocity_ml"]


@pytest.fixture()
def seeded_root(tmp_path, monkeypatch):
    raw_dir = tmp_path / "downloaded_raw_bessaker_data"
    raw_dir.mkdir()
    day = date(2018, 3, 7)
    _write_fake_nc(str(raw_dir / downloader.raw_filename(day, "T00Z.nc")))

    def _no_network(url, local):
        raise OSError(f"no egress: {url}")

    import urllib.request

    monkeypatch.setattr(urllib.request, "urlretrieve", _no_network)
    return str(tmp_path), day


def test_download_dataset_end_to_end(seeded_root):
    data_root, day = seeded_root
    valid = downloader.download_dataset(data_root, day, day, NZ)

    # 12 hourly samples from the present T00Z file, minus the poisoned one;
    # the unreachable T12Z file contributes nothing
    expect = [f"2018-03-07-{h:02d}.pkl" for h in range(12) if h != 5]
    assert sorted(valid) == expect

    folder = dfiles.dataset_folder(data_root, f"bessaker_z{NZ}")
    z, zag, u, v, w, p = dfiles.read_sample(folder, valid[0])
    # crop: x 4:-4 of 12, y 4:-3 of 11, z levels 1:1+NZ after reversal
    assert z.shape == (4, 4, NZ)
    # gph was the raw z index; ground-first reversal + slice(1, 4) keeps
    # raw levels [3, 2, 1] in that order
    assert np.array_equal(z[0, 0], [3.0, 2.0, 1.0])

    # static terrain + axes (x1e5) extracted from the first opened file
    terrain, x, y = dfiles.read_static(
        os.path.join(data_root, "full_dataset_files")
    )
    assert terrain.shape == (4, 4)
    assert np.array_equal(x, 1e5 * np.arange(12.0)[4:-4])
    assert np.array_equal(y, 1e5 * np.arange(11.0)[4:-3])
    assert np.allclose(zag, z - terrain[:, :, None])

    # per-sample max stats written with the reference's signed uvw max
    stats = dfiles.read_max_stats(folder, valid[0])
    assert stats[3] == pytest.approx(max(u.max(), v.max(), w.max()))

    raw_dir = os.path.join(data_root, "downloaded_raw_bessaker_data")
    with open(os.path.join(raw_dir, "invalid_files.txt")) as f:
        assert downloader.raw_filename(day, "T12Z.nc") in f.read()
    # the filtered ledger is z-config-scoped (validity is judged on the
    # z-cropped arrays), so it lives in the dataset folder, not raw_dir
    with open(os.path.join(folder, "filtered_samples.txt")) as f:
        assert f.read().splitlines() == ["2018-03-07-05.pkl"]

    # cross-config independence: the poison voxel sits at raw z=2, inside
    # the z3 crop (raw levels [3,2,1]) but OUTSIDE the z1 crop ([3]) — the
    # hour filtered at z3 must still be valid at z1
    valid_z1 = downloader.download_dataset(data_root, day, day, 1)
    assert "2018-03-07-05.pkl" in valid_z1


def test_second_call_does_no_rework(seeded_root, monkeypatch):
    data_root, day = seeded_root
    first = downloader.download_dataset(data_root, day, day, NZ)

    def _boom(path):
        raise AssertionError("raw .nc re-parsed on a warm cache")

    monkeypatch.setattr(downloader, "open_nc", _boom)
    second = downloader.download_dataset(data_root, day, day, NZ)
    assert second == first
