"""Schema pins: synthetic fixtures vs the reference notebooks' records.

Three of the four reference Data/*.nc files are absent from the snapshot
(SURVEY.md §2.3); utils/synth.py stands in for them.  These tests pin each
generator to what the executed reference notebooks RECORD about the missing
files — printed xarray schemas, Grid metric declarations, and creation
code — so the stand-ins cannot silently drift from the workloads they
represent.  Citations point at the recording cells.
"""

import numpy as np

from xcontour_tpu.utils import synth


def test_pv_schema_matches_notebook_record():
    """notebooks/1.Keff_atmos.ipynb cell 1 printed the full PV.nc schema:

        Dimensions:   (longitude: 480, latitude: 241, level: 15)
        longitude  (longitude) float32 0.0 0.75 1.5 ... 357.8 358.5 359.2
        latitude   (latitude)  float32 -90.0 -89.25 ... 89.25 90.0
        level      (level)     int32   265 275 285 300 315 330 ... 430 475
                                       530 600 700 850
        pv         (level, latitude, longitude) float32
        grdSpv     (level, latitude, longitude) float32

    (The scalar datetime64 `time` coordinate is metadata no workload reads;
    HDF5 cannot store datetime64, so the generator omits it by design.)"""
    v, dims = synth.synth_pv(nlev=15, nlat=241, nlon=480)

    assert dims["pv"] == ("level", "latitude", "longitude")
    assert dims["grdSpv"] == ("level", "latitude", "longitude")
    assert v["pv"].shape == (15, 241, 480)
    assert v["grdSpv"].shape == (15, 241, 480)
    assert v["pv"].dtype == np.float32
    assert v["grdSpv"].dtype == np.float32

    assert v["longitude"].dtype == np.float32
    np.testing.assert_allclose(v["longitude"],
                               np.arange(480, dtype=np.float64) * 0.75,
                               atol=1e-5)
    assert v["latitude"].dtype == np.float32
    np.testing.assert_allclose(v["latitude"],
                               np.linspace(-90.0, 90.0, 241), atol=1e-5)
    assert v["latitude"][0] == -90.0 and v["latitude"][-1] == 90.0  # exact

    assert v["level"].dtype == np.int32
    np.testing.assert_array_equal(
        v["level"], [265, 275, 285, 300, 315, 330, 350, 370, 395, 430,
                     475, 530, 600, 700, 850])
    # downscaled fixtures keep the ladder's range and dtype
    v2, _ = synth.synth_pv(nlev=5, nlat=91, nlon=144)
    assert v2["level"].dtype == np.int32
    assert v2["level"][0] == 265 and v2["level"][-1] == 850
    assert (np.diff(v2["level"]) > 0).all()


def test_internalwave_schema_matches_notebook_grid_declaration():
    """Data/internalwave.nc was written by the reference's own
    add_MITgcm_missing_metrics + squeeze (creation code recorded in
    /root/reference/tests/test_LAPE.py:17-25), so it carries the COMPLETED
    metric set that notebooks/3.LAPE_ocean.ipynb cell 1 declares:

        Grid(ds, metrics={('X',): ['dxG','dxF','dxC','dxV'],
                          ('Z',): ['drW','drS','drC','drF','drG'],
                          ('X','Z'): ['yA']})

    with THETA masked by ds.maskC.  The completion formulas are
    reference utils.py:443-448 (drW/drS/drC = hFac*drF) and utils.py:468-469
    (yA = drF*hFacC*dxF).  After the Y squeeze, X distances are 1-D (XC,)
    and the partial-cell fields are (Z, XC).  (drG is derived only in a
    commented-out branch, utils.py:449-451 — absent from the completion the
    file records, so not required here.)"""
    nz, nx = 24, 64
    v, dims = synth.synth_internalwave(nt=3, nz=nz, nx=nx)

    assert dims["THETA"] == ("time", "Z", "XC")
    assert v["THETA"].shape == (3, nz, nx)
    assert v["THETA"].dtype == np.float32
    assert v["time"].dtype == np.int32

    for name in ("dxG", "dxF", "dxC", "dxV"):          # nb3 ('X',) metrics
        assert dims[name] == ("XC",), name
        assert v[name].shape == (nx,)
    assert dims["drF"] == ("Z",) and v["drF"].shape == (nz,)
    for name in ("drW", "drS", "drC"):                 # nb3 ('Z',) metrics
        assert dims[name] == ("Z", "XC"), name
    assert dims["yA"] == ("Z", "XC")

    # the completion identities the reference derived the fields with
    np.testing.assert_allclose(v["drW"], v["hFacW"] * v["drF"][:, None],
                               rtol=1e-6)               # utils.py:443-444
    np.testing.assert_allclose(v["drS"], v["hFacS"] * v["drF"][:, None],
                               rtol=1e-6)               # utils.py:445-446
    np.testing.assert_allclose(v["drC"], v["hFacC"] * v["drF"][:, None],
                               rtol=1e-6)               # utils.py:447-448
    np.testing.assert_allclose(
        v["yA"], v["drF"][:, None] * v["hFacC"] * v["dxF"][None, :],
        rtol=1e-6)                                      # utils.py:468-469

    # MITgcm conventions: maskC = open cells, fractional hFac in (0, 1] at
    # the cut bottom cells, THETA exactly 0 over rock, Z negative decreasing
    np.testing.assert_array_equal(v["maskC"], (v["hFacC"] > 0))
    assert ((v["hFacC"] >= 0) & (v["hFacC"] <= 1)).all()
    assert ((v["hFacC"] > 0) & (v["hFacC"] < 1)).any()  # genuine partials
    assert (v["THETA"][:, v["maskC"] == 0] == 0).all()
    assert (np.diff(v["Z"]) < 0).all() and (v["Z"] < 0).all()


def test_global_tracers_schema_matches_notebook():
    """notebooks/4.ContourLength_ocean.ipynb cell 1:

        ds = xr.open_dataset('../Data/globalTracers.nc')
        ds['time'] = np.array([0, 90, 180, 270, 360])
        dset, grid = add_latlon_metrics(ds, dims={'Y':'YC', 'X':'XC'}, ...)
        tr1 = dset.PTRACER01.where(dset.PTRACER01 != 0)

    so: PTRACER01/04/07 float32 on (time, YC, XC), five time steps
    [0, 90, 180, 270, 360], land stored as exact 0 (the `.where(!=0)`
    re-mask convention, also tests/test_clength.py:307-313), lat-lon
    coordinates under MITgcm names YC/XC."""
    v, dims = synth.synth_global_tracers(nt=5, nlat=160, nlon=320)

    for name in ("PTRACER01", "PTRACER04", "PTRACER07"):
        assert dims[name] == ("time", "YC", "XC"), name
        assert v[name].shape == (5, 160, 320)
        assert v[name].dtype == np.float32
        # land is exact 0, and it is land (the mask), not data
        land = np.asarray(v["maskC"]) == 0
        assert (v[name][:, land] == 0).all()
        assert np.abs(v[name][:, ~land]).min() > 0

    np.testing.assert_array_equal(v["time"], [0, 90, 180, 270, 360])
    assert v["time"].dtype == np.int32
    assert v["YC"].dtype == np.float32 and v["XC"].dtype == np.float32
    assert (np.diff(v["YC"]) > 0).all()                 # ascending latitude
    assert v["XC"][0] == 0.0 and float(v["XC"][-1]) < 360.0
