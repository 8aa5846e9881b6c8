"""Reference-namespace facade + clength/fractal pipeline tests."""

import numpy as np
import jax.numpy as jnp
import pytest

from xcontour_tpu import compat
from xcontour_tpu.utils import synth
from xcontour_tpu.utils.ncio import Dataset


def test_add_latlon_metrics_facade(vorticity):
    from xcontour_tpu.xcontour import add_latlon_metrics, Contour2D
    lat, lon, vor = vorticity
    ds = Dataset(variables=dict(latitude=lat, longitude=lon,
                                absolute_vorticity=vor),
                 dims=dict(latitude=("latitude",), longitude=("longitude",),
                           absolute_vorticity=("latitude", "longitude")))
    metrics, grid = add_latlon_metrics(ds, dtype=jnp.float64)
    assert grid.periodic_x and grid.latlon
    assert set(metrics) >= {"rA", "dxF", "dyF", "dxG", "dyG"}
    np.testing.assert_allclose(metrics["rA"].sum(),
                               4 * np.pi * 6371200.0 ** 2, rtol=1e-3)
    # the facade class consumes the facade grid directly
    an = Contour2D(grid, jnp.asarray(vor),
                   dims={"X": "longitude", "Y": "latitude"},
                   dimEq={"Y": "latitude"}, increase=True, lt=True,
                   dtype=jnp.float64)
    ctr = an.cal_contours(31)
    want = compat.contours_linspace(vor, 31, True)
    np.testing.assert_allclose(np.asarray(ctr), want, rtol=1e-12)


def test_add_mitgcm_missing_metrics_facade():
    from xcontour_tpu.xcontour import add_MITgcm_missing_metrics
    v, dims = synth.synth_internalwave(nt=1, nz=20, nx=64)
    metrics, grid = add_MITgcm_missing_metrics(v, dtype=jnp.float64)
    np.testing.assert_allclose(metrics["yA"], v["yA"], rtol=1e-6)
    assert grid.dim_names == ("Z", "XC")
    # partial cells enter the plane areas
    assert float(grid.total_area()) < float(np.sum(v["drF"][:, None] *
                                                   v["dxF"]))


@pytest.mark.slow
def test_clength_pipeline_invariants(vorticity):
    """The Cauchy-Schwarz chain L_eq >= L >= L_min (reference notebook 4
    cell 0) holds on the bundled snapshot for interior contours."""
    from xcontour_tpu import grid as G
    from xcontour_tpu.pipeline import clength_pipeline
    lat, lon, vor = vorticity
    grid = G.from_latlon(lat, lon, dtype=jnp.float64)
    out = clength_pipeline(jnp.asarray(vor), grid, N=61, increase=True,
                           lt=True)
    L = np.asarray(out["lengths"])
    Leq = np.sqrt(np.asarray(out["Leq2"]))
    Lmin = np.asarray(out["Lmin"])
    sl = slice(5, -5)
    ok = np.isfinite(L[sl]) & np.isfinite(Leq[sl]) & np.isfinite(Lmin[sl])
    assert ok.sum() > 30
    assert np.all(L[sl][ok] >= Lmin[sl][ok] * 0.98)
    assert np.all(Leq[sl][ok] >= L[sl][ok] * 0.98)
    # contour means: <|grad q|> * <1/|grad q|> >= 1 (Cauchy-Schwarz)
    prod = np.asarray(out["cmGrd"]) * np.asarray(out["cmInvGrd"])
    fin = np.isfinite(prod[sl])
    assert np.all(prod[sl][fin] >= 0.98)


@pytest.mark.slow
def test_fractal_pipeline(vorticity):
    from xcontour_tpu import grid as G
    from xcontour_tpu.pipeline import fractal_pipeline
    lat, lon, vor = vorticity
    grid = G.from_latlon(lat, lon, dtype=jnp.float64)
    out = fractal_pipeline(jnp.asarray(vor), grid, N=41,
                           strides=(1, 2, 4, 8), increase=True, lt=True)
    D = np.asarray(out["D"])
    Dv = D[np.isfinite(D)]
    assert Dv.size > 20
    # stirred-but-smooth vorticity: dimension slightly above 1, below 2
    assert 0.9 < np.median(Dv) < 1.8
    assert out["bclens"].shape == out["lengths"].shape
    Dbc = np.asarray(out["D_bc"])
    assert np.isfinite(Dbc).sum() > 20


def test_add_latlon_metrics_full_staggered_set(vorticity):
    """The full staggered metric set of the reference metrics builder
    (utils.py:166-226): areas close over the sphere, staggered variants stay
    within discretization distance of the centered ones."""
    from xcontour_tpu.xcontour import add_latlon_metrics
    lat, lon, vor = vorticity
    ds = Dataset(variables=dict(latitude=lat, longitude=lon, level=np.array(
        [300.0, 315.0, 330.0])),
        dims=dict(latitude=("latitude",), longitude=("longitude",),
                  level=("level",)))
    metrics, grid = add_latlon_metrics(ds, dtype=jnp.float64)
    for k in ("rA", "rAw", "rAs", "rAz", "dxG", "dxF", "dxC", "dxV",
              "dyG", "dyF", "dyC", "dyU", "drF", "drG"):
        assert k in metrics, k
    sphere = 4 * np.pi * 6371200.0 ** 2
    for k in ("rA", "rAw"):
        assert abs(metrics[k].sum() - sphere) / sphere < 1e-3, k
    # mid-latitude staggered areas agree with centered to ~ cell scale
    # (near the poles the half-cell shift changes cos(lat) by tens of %)
    r = metrics["rAs"][50:-50] / metrics["rA"][50:-50]
    assert np.nanmax(np.abs(r - 1)) < 0.02
    np.testing.assert_allclose(metrics["drF"], [15.0, 15.0, 15.0])


def test_pipelines_accept_precomputed_table(vorticity):
    import jax
    """The A(Y_eq) table is tracer-independent; passing a precomputed table
    must give bit-identical results in every pipeline family."""
    from xcontour_tpu import core, grid as G
    from xcontour_tpu.pipeline import (keff_pipeline, lwa_pipeline,
                                       keff_lwa_pipeline, clength_pipeline,
                                       fractal_pipeline)
    lat, lon, vor = vorticity
    grid = G.from_latlon(lat, lon, dtype=jnp.float64)
    tr = jnp.asarray(vor[None])
    mask = grid.fluid_mask(tr.dtype)
    table = core.cal_area_eqCoord_table_hist(
        mask, grid.ydef.astype(tr.dtype), grid.dA.astype(tr.dtype),
        increase=True, lt=True)

    for fn, kw in ((keff_pipeline, dict(N=9, lmin="analytic")),
                   (lwa_pipeline, dict(N=9)),
                   (keff_lwa_pipeline, dict(N=9, lmin="analytic")),
                   (clength_pipeline, dict(N=9)),
                   (fractal_pipeline, dict(N=9, strides=(1, 2)))):
        plain = fn(tr, grid, increase=True, lt=True, **kw)
        reused = fn(tr, grid, increase=True, lt=True, table=table, **kw)
        flat_p = jax.tree_util.tree_leaves(plain)
        flat_r = jax.tree_util.tree_leaves(reused)
        for a, b in zip(flat_p, flat_r):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                          err_msg=fn.__name__)


def test_keff_lwa_lmin_frac_matches_keff(vorticity):
    """keff_lwa_pipeline supports all three Lmin conventions; 'frac' equals
    keff_pipeline's (broadcast path) and unknown modes raise."""
    from xcontour_tpu import grid as G
    from xcontour_tpu.pipeline import keff_pipeline, keff_lwa_pipeline
    lat, lon, vor = vorticity
    grid = G.from_latlon(lat, lon, dtype=jnp.float64)
    tr = jnp.asarray(vor[None])

    combined = keff_lwa_pipeline(tr, grid, N=11, increase=True, lt=True,
                                 lmin="frac")
    ref = keff_pipeline(tr, grid, N=11, increase=True, lt=True,
                        hist=True, lmin="frac")
    np.testing.assert_array_equal(np.asarray(combined["Lmin"]),
                                  np.asarray(ref["origin"]["Lmin"]))

    with pytest.raises(ValueError, match="unknown lmin"):
        keff_lwa_pipeline(tr, grid, N=11, increase=True, lt=True,
                          lmin="bogus")
