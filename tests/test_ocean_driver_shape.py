"""The reference's ocean-Keff driver sequence, call for call, through our
namespace (reference tests/test_Keff_ocean.py:15-79): MITgcm-named tracer
dataset, topography mask via where(tracer != 0), N=401 contours, numeric
Lmin from the masked dxF zonal sum interpolated to Yeq, nkeff threshold 2e7,
and the final interpolation to prescribed latitudes -70..75."""

import numpy as np
import jax.numpy as jnp

from xcontour_tpu.xcontour import Contour2D, add_latlon_metrics
from xcontour_tpu.utils.ncio import Dataset
from xcontour_tpu.utils import synth
from xcontour_tpu.ops.stencil import squared_gradient
from xcontour_tpu.ops.interp import interp1d
from xcontour_tpu import compat


def test_keff_ocean_driver_sequence():
    v, dims = synth.synth_global_tracers(nt=1, nlat=80, nlon=160)
    # the reference renames XC/YC to longitude/latitude before the metric
    # builder (test_Keff_ocean.py:16)
    dset = Dataset(variables=dict(latitude=v["YC"], longitude=v["XC"],
                                  PTRACER04=v["PTRACER04"],
                                  maskC=v["maskC"], dxF=v["dxF"]),
                   dims=dict(latitude=("latitude",), longitude=("longitude",),
                             PTRACER04=("time", "latitude", "longitude"),
                             maskC=("latitude", "longitude"),
                             dxF=("latitude", "longitude")))
    metrics, grid = add_latlon_metrics(dset, dtype=jnp.float64)

    # tracer = PTRACER04.where(!= 0): land becomes NaN (test_Keff_ocean.py:22)
    tr = np.asarray(dset["PTRACER04"][0], np.float64)
    tracer = jnp.asarray(np.where(tr != 0, tr, np.nan))
    grdS = squared_gradient(tracer, grid)

    increase, lt = True, True
    N = 401
    cm = Contour2D(grid, tracer,
                   dims={"X": "longitude", "Y": "latitude"},
                   dimEq={"Y": "latitude"},
                   increase=increase, lt=lt, dtype=jnp.float64)
    mask = jnp.asarray(v["maskC"], jnp.float64)
    preY = np.linspace(-70, 75, N)

    table = cm.cal_area_eqCoord_table_hist(mask)
    ctr = cm.cal_contours(N)
    area = cm.cal_integral_within_contours_hist(ctr)
    intgrdS = cm.cal_integral_within_contours_hist(ctr, integrand=grdS)
    Yeq = table.lookup_coordinates(area)

    # numeric Lmin: masked dxF zonal sum -> interp at Yeq
    # (test_Keff_ocean.py:59-65)
    pre_lmin = jnp.sum(mask * jnp.asarray(dset["dxF"], jnp.float64), axis=-1)
    ydef = grid.ydef
    Lmin = interp1d(Yeq, ydef, pre_lmin, increasing=True)

    dgrdSdA = cm.cal_gradient_wrt_area(intgrdS, area)
    dqdA = cm.cal_gradient_wrt_area(ctr, area)
    Leq2 = cm.cal_sqared_equivalent_length(dgrdSdA, dqdA)
    nkeff = cm.cal_normalized_Keff(Leq2, Lmin, mask=2e7)

    interp = cm.interp_to_dataset(preY, Yeq, dict(
        contour=ctr, intArea=area, Yeq=Yeq, intgrdS=intgrdS, Leq2=Leq2,
        Lmin=Lmin, nkeff=nkeff))

    # shape + sanity assertions the visual reference driver never made
    assert np.asarray(ctr).shape == (N,)
    for k in ("contour", "intArea", "Leq2", "nkeff"):
        assert np.asarray(interp[k]).shape == (N,), k
    Yv = np.asarray(Yeq)
    # Yeq is monotone up to table-interpolation wiggle within one grid row
    # (the reference warns A(q) can be locally flat at high contour counts
    # on masked fields, tests/test_LWA.py:26)
    row = float(np.max(np.abs(np.diff(np.asarray(ydef)))))
    assert np.all(np.diff(Yv[np.isfinite(Yv)]) >= -row)
    nk = np.asarray(nkeff)
    fin = np.isfinite(nk)
    # N=401 contours on the 80-row synthetic field oversamples the tracer
    # range: most contours collapse onto shared bins (dqdA ~ 0) and get
    # threshold-masked, exactly as the oracle cross-check below reproduces
    assert fin.sum() > N * 0.1
    # nkeff is positive; the >=1 bound does NOT hold with the numeric
    # masked-dxF Lmin (multi-basin masks make the zonal sum exceed the true
    # minimal contour length) — the reference never asserts it either
    assert np.nanmin(nk[fin]) > 0.0
    # total masked area is the table endpoint
    total = float(jnp.sum(mask * grid.dA))
    np.testing.assert_allclose(float(np.asarray(area)[-1]), total,
                               rtol=1e-10)

    # oracle cross-check of the hist chain on this masked ocean case
    want = compat.keff_snapshot(
        np.asarray(tracer), np.asarray(grdS), np.asarray(ydef),
        np.asarray(grid.dA, np.float64), np.asarray(dset["dxF"], np.float64),
        np.asarray(v["maskC"], np.float64), preY, N=N,
        increase=increase, lt=lt, hist=True, lmin="dxF")
    np.testing.assert_allclose(np.asarray(area), want["origin"]["intArea"],
                               rtol=1e-10)
    np.testing.assert_allclose(Yv, want["origin"]["Yeq"], atol=1e-8)
    got_nk = np.asarray(nkeff)
    wnk = want["origin"]["nkeff"]
    both = np.isfinite(got_nk) & np.isfinite(wnk)
    assert both.sum() > N * 0.1
    np.testing.assert_allclose(got_nk[both], wnk[both], rtol=1e-6)
