"""Coverage for the remaining public API surface: contour means, Table
inverse lookup, cal_contours_at, interp_to_dataset, weigh means."""

import numpy as np
import jax.numpy as jnp
import pytest

from xcontour_tpu import compat, core
from xcontour_tpu import grid as G


@pytest.fixture(scope="module")
def an(vorticity):
    lat, lon, vor = vorticity
    grid = G.from_latlon(lat, lon, dtype=jnp.float64)
    a = core.Contour2D(grid, jnp.asarray(vor), increase=True, lt=True,
                       dtype=jnp.float64)
    return lat, lon, vor, grid, a


def test_contour_weigh_mean_paths(an, rng):
    """Thickness-weighted mean: hist path == oracle composition; broadcast
    path close on interior contours (reference core.py:491-552)."""
    lat, lon, vor, grid, a = an
    f = rng.uniform(0.5, 1.5, size=vor.shape)
    ctr = a.cal_contours(41)
    dA = np.asarray(grid.dA)

    got_h = np.asarray(a.cal_contour_weigh_mean_hist(ctr, jnp.asarray(f)))
    intA = compat.integral_within_contours_hist(vor, np.asarray(ctr), dA, f, True)
    area = compat.integral_within_contours_hist(vor, np.asarray(ctr), dA, None, True)
    want = compat.gradient_wrt_area(intA, area)
    np.testing.assert_allclose(got_h, want, rtol=1e-9)

    got_b = np.asarray(a.cal_contour_weigh_mean(ctr, jnp.asarray(f)))
    np.testing.assert_allclose(got_b[2:-2], got_h[2:-2], rtol=1e-6)


def test_contour_mean_is_weighted_ratio(an, rng):
    """<f|grad q|>/<|grad q|> of a constant integrand is that constant."""
    lat, lon, vor, grid, a = an
    grdm = jnp.asarray(rng.uniform(0.5, 2.0, size=vor.shape))
    ctr = a.cal_contours(31)
    cm = np.asarray(a.cal_contour_mean_hist(ctr, jnp.ones_like(grdm), grdm))
    fin = np.isfinite(cm)
    np.testing.assert_allclose(cm[fin], 1.0, rtol=1e-6)


def test_table_lookup_roundtrip(an):
    """lookup_values is the inverse of lookup_coordinates (the reference's
    lookup_values crashes on a typo, core.py:1190 — fixed here)."""
    lat, lon, vor, grid, a = an
    table = a.cal_area_eqCoord_table_hist(jnp.ones(grid.shape, jnp.float64))
    coords = jnp.asarray(np.linspace(lat[5], lat[-5], 40))
    values = table.lookup_values(coords)
    back = table.lookup_coordinates(values)
    np.testing.assert_allclose(np.asarray(back), np.asarray(coords), atol=1e-6)


def test_table_mixed_direction_batch_raises(an):
    """A batch whose elements disagree on table direction must raise, like
    the reference's "not every time or level is increasing/decreasing"
    (core.py:1122-1134) — instead of silently sniffing element 0."""
    vals = jnp.asarray(np.stack([np.linspace(0.0, 1.0, 8),
                                 np.linspace(1.0, 0.0, 8)]))
    table = core.Table(values=vals, coords=jnp.asarray(np.linspace(-80, 80, 8)))
    with pytest.raises(ValueError, match="increasing/decreasing"):
        table.lookup_coordinates(jnp.asarray([0.5]))
    # the checkify twin fires the same guard for in-jit use
    import jax
    from jax.experimental import checkify

    def f(v):
        t = core.Table(values=v, coords=table.coords)
        t.check_direction()
        return t.values.sum()

    err, _ = checkify.checkify(jax.jit(f))(vals)
    with pytest.raises(Exception, match="increasing/decreasing"):
        err.throw()
    # a uniform batch passes both guards
    ok = jnp.asarray(np.stack([np.linspace(0.0, 1.0, 8),
                               np.linspace(0.1, 2.0, 8)]))
    core.Table(values=ok, coords=table.coords).lookup_coordinates(
        jnp.asarray([0.5]))
    err, _ = checkify.checkify(jax.jit(f))(ok)
    err.throw()


def test_interp_to_coords_axis(an, rng):
    """interp_to_coords(axis=) — the reference's interpDim= generality
    (core.py:1050): interpolating along a non-last axis equals moving that
    axis last, interpolating, and moving back."""
    B, N, K = 3, 17, 5
    eq = np.sort(rng.uniform(-60, 60, size=(B, N)), axis=-1)
    var = rng.normal(size=(B, N))
    pre = jnp.asarray(np.linspace(-50, 50, 9))
    want = core.interp_to_coords(pre, jnp.asarray(eq), jnp.asarray(var))
    # put the interp axis in the middle: (B, N, K) with interp along axis -2
    eq3 = np.repeat(eq[:, :, None], K, axis=2)
    var3 = np.repeat(var[:, :, None], K, axis=2)
    got = core.interp_to_coords(pre, jnp.asarray(eq3), jnp.asarray(var3),
                                axis=-2)
    assert got.shape == (B, 9, K)
    for k in range(K):
        np.testing.assert_allclose(np.asarray(got[:, :, k]),
                                   np.asarray(want), rtol=1e-12)
    # non-negative axis with equal ranks works; rank mismatch is rejected
    got_pos = core.interp_to_coords(pre, jnp.asarray(eq3), jnp.asarray(var3),
                                    axis=1)
    np.testing.assert_allclose(np.asarray(got_pos), np.asarray(got), rtol=0)
    with pytest.raises(ValueError, match="ambiguous"):
        core.interp_to_coords(pre, jnp.asarray(eq), jnp.asarray(var3), axis=1)
    # facade passes axis through
    a = an[4]
    got_f = a.interp_to_coords(pre, jnp.asarray(eq3), jnp.asarray(var3),
                               axis=-2)
    np.testing.assert_allclose(np.asarray(got_f), np.asarray(got), rtol=0)


def test_cal_contours_at(an):
    """Contours at prescribed equivalent latitudes: looking their areas up
    again lands near the prescribed coordinates (reference core.py:269-360).

    The exact/broadcast paths round-trip; the hist path inherits the
    reference's extremal-bins assumption (core.py:1208-1210) and is biased
    for interior levels, so it is only exercised for shape/monotonicity.
    """
    lat, lon, vor, grid, a = an
    table = a.cal_area_eqCoord_table_hist(jnp.ones(grid.shape, jnp.float64))
    pre_y = np.linspace(-60, 60, 41)
    for method in ("exact", "broadcast"):
        q_at = np.asarray(a.cal_contours_at_exact(pre_y, table) if
                          method == "exact" else
                          a.cal_contours_at(pre_y, table))
        assert q_at.shape == (41,)
        assert np.all(np.diff(q_at) > 0)
        area = a.cal_integral_within_contours_exact(jnp.asarray(q_at))
        yeq = np.asarray(table.lookup_coordinates(area))
        sl = slice(3, -3)
        np.testing.assert_allclose(yeq[sl], pre_y[sl], atol=1.0,
                                   err_msg=method)
    q_h = np.asarray(a.cal_contours_at_hist(pre_y, table))
    assert np.all(np.diff(q_h) > 0)


def test_interp_to_dataset(an):
    lat, lon, vor, grid, a = an
    ctr = a.cal_contours(41)
    area = a.cal_integral_within_contours_hist(ctr)
    table = a.cal_area_eqCoord_table_hist(jnp.ones(grid.shape, jnp.float64))
    yeq = table.lookup_coordinates(area)
    ds = a.interp_to_dataset(np.linspace(-80, 80, 33), yeq,
                             {"q": ctr, "area": area})
    assert set(ds) == {"q", "area"}
    assert np.asarray(ds["q"]).shape == (33,)
    # interpolated area must be monotone in latitude
    ar = np.asarray(ds["area"])
    assert np.all(np.diff(ar) >= -1e-6 * ar.max()) or \
        np.all(np.diff(ar) <= 1e-6 * ar.max())


def test_interp_extrapolate_nan(rng):
    from xcontour_tpu.ops.interp import interp1d
    xf = jnp.asarray(np.linspace(0, 1, 11))
    yf = xf * 2
    x = jnp.asarray([-0.5, 0.5, 1.5])
    clamp = np.asarray(interp1d(x, xf, yf))
    np.testing.assert_allclose(clamp, [0.0, 1.0, 2.0], atol=1e-12)
    nan = np.asarray(interp1d(x, xf, yf, extrapolate="nan"))
    assert np.isnan(nan[0]) and np.isnan(nan[2])
    np.testing.assert_allclose(nan[1], 1.0, atol=1e-12)


def test_get_extrema_extend(rng):
    d = jnp.asarray(rng.normal(size=(10, 10)))
    lo, hi = core.get_extrema_extend(d, 5)
    dn = np.asarray(d)
    step = (dn.max() - dn.min()) / 5
    np.testing.assert_allclose(float(lo), dn.min() - step, rtol=1e-6)
    np.testing.assert_allclose(float(hi), dn.max() + step, rtol=1e-6)


def test_from_arrays_constructor(vorticity):
    """The vendored-generation ctor (tracer + dA, reference core.py:20-21)."""
    lat, lon, vor = vorticity
    grid = G.from_latlon(lat, lon, dtype=jnp.float64)
    a = core.Contour2D.from_arrays(jnp.asarray(vor), grid.dA, lat, lon,
                                   latlon=True, periodic_x=True,
                                   increase=True, lt=True, dtype=jnp.float64)
    ctr = a.cal_contours(21)
    ia = np.asarray(a.cal_integral_within_contours_hist(ctr))
    want = compat.integral_within_contours_hist(
        vor, np.asarray(ctr), np.asarray(grid.dA), None, True)
    np.testing.assert_allclose(ia, want, rtol=1e-10)
