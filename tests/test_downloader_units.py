"""Pure-function downloader tests (no network, no netCDF4)."""

from datetime import date

import numpy as np

from gan_sr_wind_field_tpu.data.downloader import nc_url, sample_is_invalid


def test_nc_url_scheme():
    # reference URL layout: base/YYYY/MM/DD/simra_BESSAKER_YYYYMMDD{T00Z,T12Z}.nc
    # (download_data.py:48-74)
    url = nc_url(date(2018, 3, 7), "T00Z.nc")
    assert url == (
        "https://thredds.met.no/thredds/fileServer/opwind/2018/03/07/"
        "simra_BESSAKER_20180307T00Z.nc"
    )


def test_sample_filters():
    ok = [np.ones((4, 4, 2)) for _ in range(6)]
    assert not sample_is_invalid(*ok)

    bad_nan = [a.copy() for a in ok]
    bad_nan[2][0, 0, 0] = np.nan
    assert sample_is_invalid(*bad_nan)

    bad_wind = [a.copy() for a in ok]
    bad_wind[3][0, 0, 0] = 101.0  # v > 100 m/s outlier (download_data.py:449)
    assert sample_is_invalid(*bad_wind)

    bad_p = [a.copy() for a in ok]
    bad_p[5][0, 0, 0] = 2.5e5  # pressure > 2e5 Pa
    assert sample_is_invalid(*bad_p)


def test_scipy_var_cf_unpacking(tmp_path):
    """The scipy netCDF3 shim must apply scale_factor/add_offset and mask
    _FillValue like netCDF4.Dataset does automatically (int16-packed wind
    variables are common for met data)."""
    from scipy.io import netcdf_file

    from gan_sr_wind_field_tpu.data.downloader import _ScipyNC

    path = str(tmp_path / "packed.nc")
    f = netcdf_file(path, "w")
    f.createDimension("x", 4)
    v = f.createVariable("x_wind_ml", "h", ("x",))  # int16 packed
    v[:] = np.array([100, 200, -32767, 300], dtype=np.int16)
    v.scale_factor = 0.01
    v.add_offset = 1.0
    v._FillValue = np.int16(-32767)
    f.close()

    fid = _ScipyNC(path)
    arr = fid["x_wind_ml"][:]
    fid.close()
    assert np.ma.is_masked(arr[2])
    assert np.allclose(arr[[0, 1, 3]].data, [2.0, 3.0, 4.0])
    # np.ma.filled → NaN path used by _read_var
    assert np.isnan(np.ma.filled(arr.astype(float), np.nan)[2])
