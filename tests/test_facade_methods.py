"""Facade ``Contour2D`` method wrappers == module-level functions.

The module-level functions carry their own float64-oracle tests; what can
silently rot in a facade is the *wiring* — flag forwarding (increase/lt),
dtype casts, and argument order (the reference's method table,
/root/reference/xcontour/core.py:363-1014).  These tests pin every method
that had no direct test, plus the legacy metric builder and the ctor's
validation branches.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from xcontour_tpu import compat, core
from xcontour_tpu import grid as G
from xcontour_tpu.diagnostics import length as _length
from xcontour_tpu.diagnostics import lwa as _lwa
from xcontour_tpu.xcontour import Contour2D, add_latlon_metrics_old


@pytest.fixture()
def case(rng):
    Ny, Nx = 18, 24
    lat = np.linspace(-80.0, 80.0, Ny)
    lon = np.arange(Nx) * (360.0 / Nx)
    grid = G.from_latlon(lat, lon, dim_names=("lat", "lon"),
                         dtype=jnp.float64)
    tracer = np.cumsum(rng.normal(size=(2, Ny, Nx)), axis=1)
    c = Contour2D(grid, tracer, dims={"X": "lon", "Y": "lat"},
                  dimEq={"Y": "lat"}, increase=True, lt=False,
                  dtype=jnp.float64)
    ctrs = c.cal_contours(9)
    return grid, c, jnp.asarray(tracer, jnp.float64), ctrs


def test_ctor_validation_branches(case):
    grid, _, tracer, _ = case
    with pytest.raises(ValueError, match="one dimension"):
        Contour2D(grid, tracer, dimEq={"Y": "lat", "Z": "lev"})
    with pytest.raises(ValueError, match="2D plane"):
        Contour2D(grid, tracer, dims={"X": "lon"})
    with pytest.raises(ValueError, match="do not match grid dims"):
        Contour2D(grid, tracer, dims={"X": "bogus", "Y": "weird"})
    with pytest.raises(ValueError, match="arakawa"):
        Contour2D(grid, tracer, arakawa="B")


def test_cal_contours_prescribed_levels(case):
    _, c, _, _ = case
    levels = [-3.0, -1.0, 0.5, 2.0]
    got = c.cal_contours(levels)
    np.testing.assert_array_equal(np.asarray(got),
                                  np.asarray(levels, np.float64))


def test_contour_mean_matches_oracle_composition(case, rng):
    """Simple along-contour mean <f|grad q|>/<|grad q|> — both the broadcast
    and hist facade forms vs the reference composition in float64
    (core.py:555-616)."""
    grid, c, tracer, ctrs = case
    integrand = jnp.asarray(rng.uniform(0.5, 2.0, size=tracer.shape))
    grdm = jnp.abs(tracer) + 0.1

    def oracle_mean(b):
        dA = np.asarray(c.dA)
        up = compat.gradient_wrt_area(
            compat.integral_within_contours(
                np.asarray(tracer[b]), np.asarray(ctrs[b]), dA,
                np.asarray(integrand[b] * grdm[b]), lt=False),
            compat.integral_within_contours(
                np.asarray(tracer[b]), np.asarray(ctrs[b]), dA, None,
                lt=False))
        lo = compat.gradient_wrt_area(
            compat.integral_within_contours(
                np.asarray(tracer[b]), np.asarray(ctrs[b]), dA,
                np.asarray(grdm[b]), lt=False),
            compat.integral_within_contours(
                np.asarray(tracer[b]), np.asarray(ctrs[b]), dA, None,
                lt=False))
        return up / lo

    want = np.stack([oracle_mean(b) for b in range(2)])
    got = np.asarray(c.cal_contour_mean(ctrs, integrand, grdm))
    np.testing.assert_allclose(got, want, rtol=1e-10)

    got_h = np.asarray(c.cal_contour_mean_hist(ctrs, integrand, grdm))
    assert got_h.shape == want.shape
    assert np.isfinite(got_h[:, 1:-1]).all()

    got_w = np.asarray(c.cal_contour_weigh_mean_hist(ctrs, integrand))
    want_w = np.asarray(core.cal_contour_weigh_mean_hist(
        c.tracer, ctrs, c.dA, integrand, None, lt=False))
    np.testing.assert_array_equal(got_w, want_w)


def test_keff_tail_methods(case):
    grid, c, _, ctrs = case
    dqdA = jnp.linspace(1e-14, 3e-14, 9)[None, :] * jnp.ones((2, 1))
    dgdA = jnp.linspace(1e-20, 9e-20, 9)[None, :] * jnp.ones((2, 1))
    leq2 = c.cal_sqared_equivalent_length(dgdA, dqdA)
    np.testing.assert_array_equal(
        np.asarray(leq2),
        np.asarray(core.cal_sqared_equivalent_length(dgdA, dqdA)))
    lmin = G.latitude_lengths_at(jnp.linspace(-60, 60, 9))
    nk = c.cal_normalized_Keff(leq2, lmin)
    np.testing.assert_array_equal(
        np.asarray(nk),
        np.asarray(core.cal_normalized_Keff(leq2, lmin, 1e5)))


@pytest.mark.parametrize("variant2", [False, True])
def test_lwa_methods_with_mask_capture(case, variant2):
    grid, c, tracer, _ = case
    ydef = grid.ydef.astype(jnp.float64)
    Q = jnp.sort(tracer.mean(axis=-1), axis=-1)
    meth = c.cal_local_wave_activity2 if variant2 \
        else c.cal_local_wave_activity
    fn = _lwa.local_wave_activity2 if variant2 else _lwa.local_wave_activity

    out = meth(tracer, Q)
    want = fn(tracer, Q, c.dA, ydef, increase=True, part="all")
    np.testing.assert_array_equal(np.asarray(out), np.asarray(want))

    out2, contours, masks = meth(tracer, Q, mask_idx=[3, 11])
    np.testing.assert_array_equal(np.asarray(out2), np.asarray(want))
    assert len(contours) == 2 and len(masks) == 2
    wc, wm = _lwa.lwa_masks_at(tracer, Q, c.dA, ydef, [3, 11],
                               increase=True, variant2=variant2)
    for i in range(2):
        np.testing.assert_array_equal(np.asarray(contours[i]),
                                      np.asarray(wc[..., i]))
        np.testing.assert_array_equal(np.asarray(masks[i]),
                                      np.asarray(wm[i]))

    if not variant2:
        ape = c.cal_local_APE(tracer, Q)
        np.testing.assert_array_equal(np.asarray(ape), np.asarray(out))


def test_geometry_methods(case):
    grid, c, tracer, ctrs = case
    L = c.cal_contour_lengths(9, latlon=True)
    want = _length.contour_lengths(c.tracer, c.cal_contours(9),
                                   grid.ydef.astype(c.dtype),
                                   grid.xdef.astype(c.dtype), latlon=True)
    np.testing.assert_array_equal(np.asarray(L), np.asarray(want))

    cr = c.cal_contour_crossing(float(np.asarray(ctrs)[0, 4]), stride=2)
    want_cr = _length.contour_crossing(c.tracer,
                                       float(np.asarray(ctrs)[0, 4]),
                                       c.dA, 2, mode="edge", quirks=False)
    np.testing.assert_array_equal(np.asarray(cr), np.asarray(want_cr))


def test_interp_to_coords_method(case):
    grid, c, _, _ = case
    eq = jnp.linspace(-60.0, 60.0, 9)[None, :] * jnp.ones((2, 1))
    var = jnp.linspace(0.0, 8.0, 9)[None, :] * jnp.ones((2, 1))
    pre = jnp.asarray([-45.0, 0.0, 45.0])
    got = c.interp_to_coords(pre, eq, var)
    want = core.interp_to_coords(pre.astype(c.dtype), eq, var)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_add_latlon_metrics_old(case):
    """Legacy rectangle-area builder (reference utils.py:261-415):
    rA = dyF * dxF, no exact spherical correction."""
    Ny, Nx = 12, 16
    lat = np.linspace(-75.0, 75.0, Ny)
    lon = np.arange(Nx) * (360.0 / Nx)
    metrics, grid = add_latlon_metrics_old(
        {"lat": lat, "lon": lon}, dtype=jnp.float64)
    assert metrics["rA"].shape == (Ny, Nx)
    np.testing.assert_allclose(metrics["rA"],
                               metrics["dyF"] * metrics["dxF"], rtol=1e-12)
    assert grid.latlon and grid.shape == (Ny, Nx)
    # rectangle areas differ from the exact spherical ones away from the
    # equator, but only mildly at these spacings
    _, g_exact = __import__("xcontour_tpu.xcontour", fromlist=["x"]) \
        .add_latlon_metrics({"lat": lat, "lon": lon}, dtype=jnp.float64)
    ratio = np.asarray(grid.dA) / np.asarray(g_exact.dA)
    assert 0.9 < np.median(ratio) < 1.1
