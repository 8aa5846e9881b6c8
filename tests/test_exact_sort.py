"""Exact sort-based conditional integrals: the third rearrangement primitive.

Key property: the exact path equals the broadcast path bit-for-bit in
semantics (strict comparisons, NaN skipping) while costing O(G log G), and
bounds the histogram path's binning error.
"""

import numpy as np
import jax.numpy as jnp

from xcontour_tpu import compat, core


def test_exact_equals_broadcast(vorticity, rng):
    lat, lon, vor = vorticity
    dA = rng.uniform(0.5, 2.0, size=vor.shape)
    v = vor.copy()
    v[40:60, 100:140] = np.nan
    for lt in (True, False):
        ctr = compat.contours_linspace(v, 61, True)
        want = compat.integral_within_contours(v, ctr, dA, None, lt)
        got = core.cal_integral_within_contours_exact(
            jnp.asarray(v), jnp.asarray(ctr), jnp.asarray(dA), lt=lt)
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-11, atol=1e-7)


def test_exact_vs_hist_interior(vorticity):
    """Histogram binning agrees with the exact sums away from the extreme
    contours (where the prepended-bin/right-inclusive conventions differ)."""
    lat, lon, vor = vorticity
    dA = np.ones_like(vor)
    ctr = compat.contours_linspace(vor, 121, True)
    ex = np.asarray(core.cal_integral_within_contours_exact(
        jnp.asarray(vor), jnp.asarray(ctr), jnp.asarray(dA), lt=True))
    hi = np.asarray(core.cal_integral_within_contours_hist(
        jnp.asarray(vor), jnp.asarray(ctr), jnp.asarray(dA), lt=True))
    np.testing.assert_allclose(ex[1:-1], hi[1:-1], rtol=1e-10)


def test_exact_with_integrand_batched(rng):
    v = rng.normal(size=(3, 20, 30))
    f = rng.uniform(-1, 1, size=(3, 20, 30))
    dA = rng.uniform(0.5, 2.0, size=(20, 30))
    ctr = np.stack([np.linspace(v[b].min(), v[b].max(), 17) for b in range(3)])
    got = np.asarray(core.cal_integral_within_contours_exact(
        jnp.asarray(v), jnp.asarray(ctr), jnp.asarray(dA),
        jnp.asarray(f), lt=False))
    for b in range(3):
        want = compat.integral_within_contours(v[b], ctr[b], dA, f[b], False)
        np.testing.assert_allclose(got[b], want, rtol=1e-11, atol=1e-12)


def test_exact_decreasing_levels(rng):
    v = rng.normal(size=(16, 16))
    dA = np.ones((16, 16))
    ctr = compat.contours_linspace(v, 11, False)  # decreasing
    want = compat.integral_within_contours(v, ctr, dA, None, True)
    got = np.asarray(core.cal_integral_within_contours_exact(
        jnp.asarray(v), jnp.asarray(ctr), jnp.asarray(dA), lt=True))
    np.testing.assert_allclose(got, want, rtol=1e-12)
