"""End-to-end Keff parity on the bundled barotropic-vorticity snapshot.

Recreates the reference's own hardest correctness surface — the xarray-vs-
histogram cross-path comparison across all four increase x lt flag combos
(reference tests/test_hist.py:132-167) — but as real assertions, and adds the
JAX-vs-NumPy-oracle axis:

    jax hist path  <->  oracle hist path  <->  oracle broadcast path  <->
    jax broadcast path

all at float64 tolerances.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from xcontour_tpu import compat
from xcontour_tpu import grid as G
from xcontour_tpu.pipeline import keff_pipeline
from xcontour_tpu.ops.stencil import squared_gradient


@pytest.fixture(scope="module")
def case(vorticity):
    lat, lon, vor = vorticity
    grdS = compat.squared_gradient(vor, lat, lon, latlon=True, periodic_x=True)
    # pole rows zeroed like the reference driver (tests/test_hist.py:123-126)
    grdS[0:2, :] = 0.0
    grdS[-2:, :] = 0.0
    grid = G.from_latlon(lat, lon, dtype=jnp.float64)
    mask = np.ones_like(vor)
    pre_y = np.linspace(-90, 90, 251)
    return lat, lon, vor, grdS, grid, mask, pre_y


FLAGS = [(True, True), (True, False), (False, True), (False, False)]


def _nan_allclose(a, b, rtol, name="", atol=1e-9):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    # finiteness patterns must agree element-for-element (measured: they do,
    # on all four flag combos — NaNs appear at the same degenerate contours
    # in both paths)
    mism = np.isfinite(a) != np.isfinite(b)
    assert not mism.any(), f"{name}: finiteness differs at {np.where(mism)}"
    fin = np.isfinite(a)
    np.testing.assert_allclose(a[fin], b[fin], rtol=rtol, atol=atol, err_msg=name)


@pytest.mark.parametrize("increase,lt", FLAGS)
def test_jax_hist_matches_oracle(case, increase, lt):
    lat, lon, vor, grdS, grid, mask, pre_y = case
    want = compat.keff_snapshot(vor, grdS, lat, np.asarray(grid.dA),
                                np.asarray(grid.dxF), mask, pre_y, N=251,
                                increase=increase, lt=lt, hist=True)
    got = keff_pipeline(jnp.asarray(vor), grid, jnp.asarray(grdS),
                        jnp.asarray(mask), jnp.asarray(pre_y), N=251,
                        increase=increase, lt=lt, hist=True)
    o, w = got["origin"], want["origin"]
    np.testing.assert_allclose(np.asarray(o["contour"]), w["contour"], rtol=1e-12)
    np.testing.assert_allclose(np.asarray(o["intArea"]), w["intArea"], rtol=1e-10)
    np.testing.assert_allclose(np.asarray(o["intgrdS"]), w["intgrdS"],
                               rtol=1e-10, atol=1e-6)
    np.testing.assert_allclose(np.asarray(o["Yeq"]), w["Yeq"], atol=1e-8)
    _nan_allclose(o["Leq2"], w["Leq2"], 1e-6, "Leq2")
    _nan_allclose(o["nkeff"], w["nkeff"], 1e-6, "nkeff")
    gi, wi = got["interp"], want["interp"]
    _nan_allclose(gi["Leq2"], wi["Leq2"], 1e-6, "Leq2 interp")
    _nan_allclose(gi["Yeq"], wi["Yeq"], 1e-6, "Yeq interp")


@pytest.mark.parametrize("increase,lt", FLAGS)
@pytest.mark.slow
def test_jax_broadcast_matches_oracle(case, increase, lt):
    lat, lon, vor, grdS, grid, mask, pre_y = case
    want = compat.keff_snapshot(vor, grdS, lat, np.asarray(grid.dA),
                                np.asarray(grid.dxF), mask, pre_y, N=121,
                                increase=increase, lt=lt, hist=False)
    got = keff_pipeline(jnp.asarray(vor), grid, jnp.asarray(grdS),
                        jnp.asarray(mask), jnp.asarray(pre_y), N=121,
                        increase=increase, lt=lt, hist=False)
    o, w = got["origin"], want["origin"]
    # extreme contours are sensitive to the last float bit of the level (XLA
    # fma vs numpy rounding flips the strict comparison at the tracer
    # extremum, one cell of area) — compare the interior
    np.testing.assert_allclose(np.asarray(o["intArea"])[1:-1],
                               w["intArea"][1:-1], rtol=1e-10)
    np.testing.assert_allclose(np.asarray(o["table"]), w["table"], rtol=1e-10)
    np.testing.assert_allclose(np.asarray(o["Yeq"])[1:-1], w["Yeq"][1:-1],
                               atol=1e-8)


@pytest.mark.parametrize("increase,lt", FLAGS)
def test_cross_path_hist_vs_broadcast(case, increase, lt):
    """The reference's own numerical-equivalence oracle, asserted: the two
    integration paths agree on interior contours (the endpoints differ only
    by the strict-vs-inclusive treatment of the extreme tracer values)."""
    lat, lon, vor, grdS, grid, mask, pre_y = case
    h = keff_pipeline(jnp.asarray(vor), grid, jnp.asarray(grdS),
                      jnp.asarray(mask), jnp.asarray(pre_y), N=121,
                      increase=increase, lt=lt, hist=True)["origin"]
    b = keff_pipeline(jnp.asarray(vor), grid, jnp.asarray(grdS),
                      jnp.asarray(mask), jnp.asarray(pre_y), N=121,
                      increase=increase, lt=lt, hist=False)["origin"]
    np.testing.assert_allclose(np.asarray(h["intArea"])[1:-1],
                               np.asarray(b["intArea"])[1:-1], rtol=1e-10)
    np.testing.assert_allclose(np.asarray(h["intgrdS"])[1:-1],
                               np.asarray(b["intgrdS"])[1:-1],
                               rtol=1e-10, atol=1e-6)
    # lt-flavored combos share the same A(Yeq) table convention: Yeq must
    # agree tightly.  gt-flavored combos differ by the inclusive-vs-strict
    # row at y_k — EXACTLY a one-row table shift (pinned analytically on a
    # synthetic grid in test_parity_pinned.py), which on this slightly
    # non-uniform gaussian grid bounds the Yeq offset by the local row gap.
    ylt = lt if increase else (not lt)
    hY = np.asarray(h["Yeq"])[1:-1]
    bY = np.asarray(b["Yeq"])[1:-1]
    if ylt:
        np.testing.assert_allclose(hY, bY, atol=1e-6)
    else:
        row = float(np.max(np.abs(np.diff(lat))))
        d = np.abs(hY - bY)
        assert np.all(d <= 1.0001 * row), float(d.max())


def test_area_tables_cross_path(case):
    """Hist and broadcast A(Yeq) tables agree in the interior; both reach the
    total fluid area at the poleward end."""
    lat, lon, vor, grdS, grid, mask, pre_y = case
    from xcontour_tpu import core
    ydef = grid.ydef
    for increase, lt in FLAGS:
        tb = core.cal_area_eqCoord_table(jnp.asarray(mask, jnp.float64), ydef,
                                         grid.dA, increase=increase, lt=lt)
        th = core.cal_area_eqCoord_table_hist(jnp.asarray(mask, jnp.float64),
                                              ydef, grid.dA,
                                              increase=increase, lt=lt)
        vb = np.asarray(tb.values)
        vh = np.asarray(th.values)
        # lt-flavored tables match elementwise; gt-flavored ones differ only
        # by the inclusive-vs-strict treatment of the row AT y_k, i.e. a
        # one-row shift on a discrete coordinate (same in the reference)
        ylt = lt if increase else (not lt)
        if ylt:
            np.testing.assert_allclose(vh[1:-1], vb[1:-1], rtol=1e-10)
        else:
            np.testing.assert_allclose(vh[2:-1], vb[1:-2], rtol=1e-10)
        total = float(np.sum(np.asarray(grid.dA)))
        assert abs(max(vb[0], vb[-1]) - total) / total < 1e-12


def test_stencil_matches_oracle(case):
    lat, lon, vor, grdS, grid, mask, pre_y = case
    got = squared_gradient(jnp.asarray(vor), grid)
    want = compat.squared_gradient(vor, lat, lon, latlon=True, periodic_x=True)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-10)


def test_batched_pipeline_matches_loop(case):
    """A leading batch axis reproduces per-snapshot results — the vmap
    replacement for the reference's apply_ufunc(vectorize=True) loops."""
    lat, lon, vor, grdS, grid, mask, pre_y = case
    batch = np.stack([vor, vor[:, ::-1] * 0.7 + 1e-6])
    gbatch = np.stack([grdS, grdS[:, ::-1] * 0.5])
    got = keff_pipeline(jnp.asarray(batch), grid, jnp.asarray(gbatch),
                        jnp.asarray(mask), jnp.asarray(pre_y), N=121,
                        increase=True, lt=True, hist=True)["origin"]
    for b in range(2):
        one = keff_pipeline(jnp.asarray(batch[b]), grid, jnp.asarray(gbatch[b]),
                            jnp.asarray(mask), jnp.asarray(pre_y), N=121,
                            increase=True, lt=True, hist=True)["origin"]
        np.testing.assert_allclose(np.asarray(got["intArea"][b]),
                                   np.asarray(one["intArea"]), rtol=1e-12)
        np.testing.assert_allclose(np.asarray(got["Yeq"][b]),
                                   np.asarray(one["Yeq"]), rtol=1e-10)
