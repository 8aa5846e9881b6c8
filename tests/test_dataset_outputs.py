"""Labeled pipeline outputs: as_dataset coordinates + netCDF round-trips.

The reference pipelines return coordinate-labeled xr.Datasets
(/root/reference/xcontour/core.py:251-266, 1017-1047); as_dataset provides
the same labeled shape over the raw pipeline dicts, wired end-to-end into
the nc3/nc4 writers.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from xcontour_tpu import grid as G
from xcontour_tpu.pipeline import (keff_pipeline, keff_lwa_pipeline,
                                   clength_pipeline, fractal_pipeline,
                                   as_dataset)
from xcontour_tpu.utils.ncio import load_dataset


@pytest.fixture(scope="module")
def case(rng):
    lat = np.linspace(-80, 80, 24)
    lon = np.linspace(0, 350, 36)
    grid = G.from_latlon(lat, lon, dtype=jnp.float64)
    tr = jnp.asarray(np.sin(np.deg2rad(lat))[None, :, None]
                     + 0.1 * rng.standard_normal((3, 24, 36)))
    pre_y = np.linspace(-90, 90, 31)
    return grid, tr, pre_y


def test_combined_pipeline_labels(case):
    grid, tr, pre_y = case
    out = keff_lwa_pipeline(tr, grid, pre_y=jnp.asarray(pre_y), N=11,
                            increase=True, lt=True, with_lwa2=True)
    ds = as_dataset(out, grid, pre_y=pre_y)
    assert ds.dims_of("lwa") == ("time", "latitude", "longitude")
    assert ds.dims_of("lwa2") == ("time", "latitude", "longitude")
    assert ds.dims_of("nkeff") == ("time", "contour")
    assert ds.dims_of("levels") == ("time", "contour")
    assert ds.dims_of("Q") == ("time", "latitude")       # sorted profile
    # interp coordinate must NOT alias the grid latitude (different lengths)
    assert ds.dims_of("nkeff_at") == ("time", "latitude_interp")
    np.testing.assert_array_equal(ds.coords["latitude_interp"], pre_y)
    np.testing.assert_array_equal(ds.coords["contour"], np.arange(11))
    assert ds.attrs["lwa"]["long_name"].startswith("local finite-amplitude")
    # _at variables inherit the base attrs
    assert "nkeff_at" in ds.attrs


def test_origin_interp_sections_flattened(case):
    grid, tr, pre_y = case
    out = keff_pipeline(tr, grid, pre_y=jnp.asarray(pre_y), N=11,
                        increase=True, lt=True, hist=True)
    ds = as_dataset(out, grid, pre_y=pre_y)
    assert ds.dims_of("intArea") == ("time", "contour")
    assert ds.dims_of("intArea_at") == ("time", "latitude_interp")
    assert "levels" in ds and "levels_at" in ds


@pytest.mark.slow
def test_geometry_pipeline_labels(case):
    grid, tr, _ = case
    ds = as_dataset(clength_pipeline(tr, grid, N=11, increase=True, lt=True),
                    grid)
    assert ds.dims_of("lengths") == ("time", "contour")
    dsf = as_dataset(fractal_pipeline(tr, grid, N=11, strides=(1, 2),
                                      increase=True, lt=True), grid)
    assert dsf.dims_of("lengths") == ("time", "contour", "stride")
    assert dsf.dims_of("D") == ("time", "contour")
    np.testing.assert_array_equal(dsf.coords["stride"], [0, 1])


def test_netcdf_roundtrips(case, tmp_path):
    grid, tr, pre_y = case
    out = keff_lwa_pipeline(tr, grid, pre_y=jnp.asarray(pre_y), N=11,
                            increase=True, lt=True)
    ds = as_dataset(out, grid, pre_y=pre_y)

    p3 = str(tmp_path / "out3.nc")
    ds.to_nc3(p3)
    back = load_dataset(p3)
    np.testing.assert_allclose(back["nkeff_at"], ds["nkeff_at"],
                               rtol=1e-12, equal_nan=True)
    np.testing.assert_allclose(back["latitude_interp"], pre_y)
    np.testing.assert_allclose(back["levels"], ds["levels"], rtol=1e-12)

    p4 = str(tmp_path / "out4.nc")
    ds.to_nc4(p4)
    b4 = load_dataset(p4)
    np.testing.assert_allclose(b4["lwa"], ds["lwa"], rtol=1e-12,
                               equal_nan=True)
    # nc4 keeps dim labels via dimension scales
    assert b4.dims_of("lwa") == ("time", "latitude", "longitude") or \
        "latitude" in b4.dims_of("lwa")


def test_pre_y_equal_to_grid_reuses_dim(case):
    grid, tr, _ = case
    ydef = np.asarray(grid.ydef)
    out = keff_lwa_pipeline(tr, grid, pre_y=jnp.asarray(ydef), N=11,
                            increase=True, lt=True)
    ds = as_dataset(out, grid, pre_y=ydef)
    assert ds.dims_of("nkeff_at") == ("time", "latitude")
