"""Contour geometry tests: analytic shapes, oracle parity, box counting,
fractal dimension.

The marching-squares kernel is validated two independent ways: against exact
analytic perimeters (circle, diamond, zonal lines — checks the geometry end to
end without trusting any implementation) and against the NumPy oracle (checks
JAX/NumPy agreement cell for cell).
"""

import numpy as np
import pytest
import jax.numpy as jnp

from xcontour_tpu import compat
from xcontour_tpu import grid as G
from xcontour_tpu.diagnostics.length import contour_lengths, contour_crossing
from xcontour_tpu.diagnostics.fractal import fractal_dimension
from xcontour_tpu.utils.coarsen import coarsen
from xcontour_tpu.utils.constants import Rearth


def test_circle_perimeter_cartesian():
    """A radial field's level set is a circle: length -> 2*pi*r."""
    n = 400
    y = np.linspace(-1, 1, n)
    x = np.linspace(-1, 1, n)
    r = np.hypot(y[:, None], x[None, :])
    for rad in (0.3, 0.55, 0.8):
        got = float(np.asarray(contour_lengths(
            jnp.asarray(r), jnp.asarray([rad]), jnp.asarray(y), jnp.asarray(x),
            latlon=False))[0])
        assert abs(got - 2 * np.pi * rad) / (2 * np.pi * rad) < 2e-3


def test_diamond_perimeter_cartesian():
    """|y|+|x| level sets are diamonds with exact perimeter 4*sqrt(2)*c, and
    marching squares on the diagonal edges is exact."""
    n = 301
    y = np.linspace(-1, 1, n)
    x = np.linspace(-1, 1, n)
    d = np.abs(y)[:, None] + np.abs(x)[None, :]
    c = 0.5
    got = float(np.asarray(contour_lengths(
        jnp.asarray(d), jnp.asarray([c]), jnp.asarray(y), jnp.asarray(x),
        latlon=False))[0])
    np.testing.assert_allclose(got, 4 * np.sqrt(2) * c, rtol=1e-6)


def test_zonal_contour_latlon():
    """A zonal (latitude-line) contour has length 2*pi*R*cos(lat) — the
    t=0 invariant of reference notebook 4 (L == Lmin for a zonal tracer)."""
    lat = np.linspace(-80, 80, 161)
    lon = np.arange(0, 360, 1.0)
    f = np.broadcast_to(lat[:, None], (161, 360)).copy()
    for lat0 in (0.25, 30.25, 60.25):
        got = float(np.asarray(contour_lengths(
            jnp.asarray(f), jnp.asarray([lat0]), jnp.asarray(lat),
            jnp.asarray(lon), latlon=True))[0])
        want = 2 * np.pi * Rearth * np.cos(np.deg2rad(lat0))
        # open at the periodic seam: one missing cell of ~1/360 of the circle
        assert abs(got - want) / want < 1.2 / 360


def test_lengths_match_oracle(vorticity):
    lat, lon, vor = vorticity
    ctr = compat.contours_linspace(vor, 31, True)
    want = compat.contour_lengths(vor, ctr, lat, lon, latlon=True)
    got = np.asarray(contour_lengths(jnp.asarray(vor), jnp.asarray(ctr),
                                     jnp.asarray(lat), jnp.asarray(lon),
                                     latlon=True))
    np.testing.assert_allclose(got, want, rtol=1e-9, equal_nan=True)


def test_lengths_with_nan_mask(vorticity):
    """NaN cells generate no segments (skimage semantics)."""
    lat, lon, vor = vorticity
    v = vor.copy()
    v[60:190, 200:400] = np.nan
    ctr = compat.contours_linspace(vor, 11, True)
    want = compat.contour_lengths(v, ctr, lat, lon, latlon=True)
    got = np.asarray(contour_lengths(jnp.asarray(v), jnp.asarray(ctr),
                                     jnp.asarray(lat), jnp.asarray(lon),
                                     latlon=True))
    np.testing.assert_allclose(got, want, rtol=1e-9, equal_nan=True)
    # masking must strictly reduce (or keep) every length
    full = compat.contour_lengths(vor, ctr, lat, lon, latlon=True)
    assert np.all((want <= full * (1 + 1e-12)) | np.isnan(want))


@pytest.mark.parametrize("quirks", [False, True])
@pytest.mark.parametrize("stride", [1, 2, 4])
@pytest.mark.slow
def test_crossing_matches_oracle(vorticity, quirks, stride):
    lat, lon, vor = vorticity
    grid = G.from_latlon(lat, lon, dtype=jnp.float64)
    dA = np.asarray(grid.dA)
    ctr = compat.contours_linspace(vor, 7, True)
    got = np.asarray(contour_crossing(jnp.asarray(vor), jnp.asarray(ctr),
                                      grid.dA, stride, quirks=quirks))
    for k, c in enumerate(ctr):
        want = compat.contour_crossing(vor, float(c), dA, stride,
                                       pad_x=stride, quirks=quirks)
        np.testing.assert_allclose(got[k], want, rtol=1e-10)


@pytest.mark.slow
def test_crossing_stride_list_uses_max_pad(vorticity):
    """Stride lists share one max-stride padding (reference core.py:673-675)."""
    lat, lon, vor = vorticity
    grid = G.from_latlon(lat, lon, dtype=jnp.float64)
    ctr = compat.contours_linspace(vor, 5, True)
    strides = [1, 2, 4]
    outs = contour_crossing(jnp.asarray(vor), jnp.asarray(ctr), grid.dA,
                            strides)
    assert len(outs) == 3
    for s, o in zip(strides, outs):
        for k, c in enumerate(ctr):
            want = compat.contour_crossing(vor, float(c), np.asarray(grid.dA),
                                           s, pad_x=4)
            np.testing.assert_allclose(float(np.asarray(o)[k]), want, rtol=1e-10)


def test_coarsen_block_mean():
    f = np.arange(16.0).reshape(4, 4)
    c = np.asarray(coarsen(jnp.asarray(f), 2))
    np.testing.assert_allclose(c, [[2.5, 4.5], [10.5, 12.5]])
    f[0, 0] = np.nan
    c = np.asarray(coarsen(jnp.asarray(f), 2))
    np.testing.assert_allclose(c[0, 0], (1 + 4 + 5) / 3)


def test_fractal_dimension_straight_vs_rough():
    """A straight line has D=1 exactly; lengths growing as ruler^-0.3 give
    D = 1.3 from the closed-form fit."""
    strides = np.array([1.0, 2.0, 4.0, 8.0])
    rulers = strides * 1000.0
    L = 7e6 * np.ones(4)
    d = float(np.asarray(fractal_dimension(jnp.asarray(L), jnp.asarray(rulers))))
    np.testing.assert_allclose(d, 1.0, atol=1e-12)
    L2 = 7e6 * (rulers / rulers[0]) ** (1 - 1.3)
    d2 = float(np.asarray(fractal_dimension(jnp.asarray(L2), jnp.asarray(rulers))))
    np.testing.assert_allclose(d2, 1.3, rtol=1e-10)
    # NaN propagates like the reference's try/except polyfit
    L3 = L2.copy(); L3[2] = np.nan
    d3 = float(np.asarray(fractal_dimension(jnp.asarray(L3), jnp.asarray(rulers))))
    np.testing.assert_allclose(d3, 1.3, rtol=1e-10)  # fit skips the NaN scale


@pytest.mark.slow
def test_fractal_on_vorticity(vorticity):
    """End-to-end fractal workflow on the bundled snapshot: D in a physically
    sensible band (reference plots ~1.0-1.6, tests/test_fractal.py:159)."""
    lat, lon, vor = vorticity
    ctr = compat.contours_linspace(vor, 21, True)
    strides = [1, 2, 4, 8]
    lengths = []
    for s in strides:
        vs = coarsen(jnp.asarray(vor), s)
        ys = coarsen(jnp.asarray(lat), 1) if s == 1 else jnp.asarray(
            lat.reshape(-1, s).mean(axis=1))
        xs = jnp.asarray(lon) if s == 1 else jnp.asarray(
            lon.reshape(-1, s).mean(axis=1))
        lengths.append(np.asarray(contour_lengths(
            vs, jnp.asarray(ctr), ys, xs, latlon=True)))
    L = np.stack(lengths, axis=-1)          # (N, S)
    reso = float(lon[1] - lon[0])
    # per-contour latitude for the ruler: use equivalent latitude of the level
    # index — here simply assert with the equator-scale ruler band
    rulers = np.asarray(strides) * np.deg2rad(reso) * Rearth * 0.7
    D = np.asarray(fractal_dimension(jnp.asarray(L), jnp.asarray(rulers)))
    Dv = D[np.isfinite(D)]
    assert Dv.size > 10
    assert np.nanmedian(Dv) > 0.95 and np.nanmedian(Dv) < 1.8


def test_endpoint_tied_level_exact_empty():
    """A level exactly equal to the field minimum (endpoint-pinned contours
    guarantee this) has no contour: the total must be EXACTLY zero -> NaN
    under the reference's empty rule, in the multi-level vectorized compile
    too.  The convex-combination vertex form makes tie fractions land
    bitwise on corners (fuzz campaign seed 500002: the old c0 + f*(c1-c0)
    form left a ~1e-10 segment once the vectorizer picked an fma)."""
    rng = np.random.default_rng(500002)
    Ny, Nx = 35, 40
    lat = np.linspace(-80.0, 80.0, Ny)
    lon = np.arange(Nx) * (360.0 / Nx)
    f = rng.integers(0, 2, size=(Ny, Nx)).astype(np.float64)
    f += 1e-3 * rng.normal(size=(Ny, Nx))
    f *= 3.2
    f[rng.uniform(size=f.shape) < 0.1] = np.nan
    for N in (1, 5, 23, 24):
        ctr = compat.contours_linspace(f, N, False)
        want = compat.contour_lengths(f, ctr, lat, lon, latlon=True)
        got = np.asarray(contour_lengths(
            jnp.asarray(f), jnp.asarray(ctr), jnp.asarray(lat),
            jnp.asarray(lon), latlon=True))
        np.testing.assert_array_equal(np.isnan(got), np.isnan(want),
                                      err_msg=f"N={N}")
        np.testing.assert_allclose(got, want, rtol=1e-9, equal_nan=True,
                                   err_msg=f"N={N}")


def test_crossing_quirks_bound_exceeds_width():
    """quirks mode can demand more column boxes than the padded width holds
    (the reference's numpy slices clamp); vectorized windows must reproduce
    the clamped blocks, not crash (fuzz seed 1004: Ny=11, Nx=8, stride=2)."""
    f = np.zeros((11, 8))
    f[5:] = 1.0
    area = np.full((11, 8), 4.0)
    for quirks in (True, False):
        want = compat.contour_crossing(f, 0.5, area, 2, quirks=quirks)
        got = float(np.asarray(contour_crossing(
            jnp.asarray(f), jnp.asarray([0.5]), jnp.asarray(area), 2,
            quirks=quirks))[0])
        assert got == want, (quirks, got, want)
