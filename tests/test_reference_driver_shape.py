"""The reference's own driver sequence, verbatim shape, through our namespace.

Mirrors tests/test_Keff_atmos.py:37-92 call for call (both API paths, the
merge, and the equivalent-latitude interpolation) so a reference user can see
their script works with only the import line changed.
"""

import numpy as np
import pytest
import jax.numpy as jnp

pytestmark = pytest.mark.slow

from xcontour_tpu.xcontour import (Contour2D, latitude_lengths_at,
                                   add_latlon_metrics)
from xcontour_tpu.utils.ncio import Dataset
from xcontour_tpu.utils import synth


def test_keff_atmos_driver_sequence():
    v, _ = synth.synth_pv(nlev=3, nlat=73, nlon=96)
    dset = Dataset(variables=dict(latitude=v["latitude"],
                                  longitude=v["longitude"],
                                  pv=v["pv"], grdSpv=v["grdSpv"]),
                   dims=dict(latitude=("latitude",), longitude=("longitude",),
                             pv=("level", "latitude", "longitude"),
                             grdSpv=("level", "latitude", "longitude")))

    # reference: dset, grid = add_latlon_metrics(dset)
    metrics, grid = add_latlon_metrics(dset, dtype=jnp.float64)
    tracer = jnp.asarray(dset["pv"], jnp.float64)
    grdS = jnp.asarray(dset["grdSpv"], jnp.float64)

    N = 61
    increase, lt = True, True
    analysis = Contour2D(grid, tracer,
                         dims={"X": "longitude", "Y": "latitude"},
                         dimEq={"Y": "latitude"},
                         increase=increase, lt=lt, dtype=jnp.float64)
    ctr = analysis.cal_contours(N)
    mask = jnp.where(tracer != -9.99e8, 1.0, 0.0)[0]

    # xarray-broadcast path (test_Keff_atmos.py:58-68)
    table = analysis.cal_area_eqCoord_table(mask)
    area = analysis.cal_integral_within_contours(ctr)
    intgrdS = analysis.cal_integral_within_contours(ctr, integrand=grdS)
    latEq = table.lookup_coordinates(area)
    Lmin = latitude_lengths_at(latEq)
    dintSdA = analysis.cal_gradient_wrt_area(intgrdS, area)
    dqdA = analysis.cal_gradient_wrt_area(ctr, area)
    Leq2 = analysis.cal_sqared_equivalent_length(dintSdA, dqdA)
    nkeff = analysis.cal_normalized_Keff(Leq2, Lmin)

    # hist path (test_Keff_atmos.py:70-83)
    table_h = analysis.cal_area_eqCoord_table_hist(mask)
    area_h = analysis.cal_integral_within_contours_hist(ctr)
    latEq_h = table_h.lookup_coordinates(area_h)

    # combined results -> equivalent-latitude space (test_Keff_atmos.py:85-92)
    preLats = np.linspace(-90, 90, 181)
    ds_latEq = analysis.interp_to_dataset(preLats, latEq, dict(
        contour=ctr, intArea=area, intgrdS=intgrdS, Leq2=Leq2,
        Lmin=Lmin, nkeff=nkeff))

    assert ds_latEq["nkeff"].shape == (3, 181)
    np.testing.assert_allclose(np.asarray(latEq_h)[:, 2:-2],
                               np.asarray(latEq)[:, 2:-2], atol=1.5)
    nk = np.asarray(ds_latEq["nkeff"])
    assert np.isfinite(nk).sum() > 200
