"""Randomized cross-path consistency fuzz.

For random fields, masks, weights, and flag combinations, the three
conditional-integral implementations (broadcast, exact sort, histogram) must
tell one consistent story: broadcast == exact everywhere (same strict-sum
semantics), and histogram == both at interior levels.  Deterministic seeds.
"""

import numpy as np
import jax.numpy as jnp

import pytest

pytestmark = pytest.mark.slow

from xcontour_tpu import core, compat


@pytest.mark.parametrize("seed", range(8))
def test_three_paths_agree(seed):
    rng = np.random.default_rng(1000 + seed)
    Ny = int(rng.integers(8, 40))
    Nx = int(rng.integers(8, 60))
    N = int(rng.integers(5, 40))
    increase = bool(rng.integers(0, 2))
    lt = bool(rng.integers(0, 2))
    with_nan = bool(rng.integers(0, 2))
    with_integrand = bool(rng.integers(0, 2))

    v = rng.normal(size=(Ny, Nx)) * rng.uniform(0.1, 10)
    if with_nan:
        v[rng.uniform(size=v.shape) < 0.15] = np.nan
    dA = rng.uniform(0.5, 2.0, size=(Ny, Nx))
    f = rng.uniform(-2, 2, size=(Ny, Nx)) if with_integrand else None

    ctr = compat.contours_linspace(v, N, increase)
    args = (jnp.asarray(v), jnp.asarray(ctr), jnp.asarray(dA),
            None if f is None else jnp.asarray(f))
    b = np.asarray(core.cal_integral_within_contours(*args, lt=lt))
    e = np.asarray(core.cal_integral_within_contours_exact(*args, lt=lt))
    h = np.asarray(core.cal_integral_within_contours_hist(*args, lt=lt))

    scale = max(np.abs(b).max(), 1e-12)
    np.testing.assert_allclose(e, b, rtol=1e-9, atol=1e-10 * scale,
                               err_msg=f"seed {seed} exact vs broadcast")
    np.testing.assert_allclose(h[1:-1], b[1:-1], rtol=1e-9,
                               atol=1e-10 * scale,
                               err_msg=f"seed {seed} hist vs broadcast")
    # oracle spot check on one path
    w = compat.integral_within_contours(v, ctr, dA, f, lt)
    np.testing.assert_allclose(b, w, rtol=1e-9, atol=1e-9 * scale,
                               err_msg=f"seed {seed} vs oracle")


@pytest.mark.parametrize("seed", range(4))
def test_table_paths_agree(seed):
    rng = np.random.default_rng(2000 + seed)
    Ny = int(rng.integers(10, 50))
    Nx = int(rng.integers(10, 50))
    increase = bool(rng.integers(0, 2))
    lt = bool(rng.integers(0, 2))
    decreasing_y = bool(rng.integers(0, 2))
    y = np.sort(rng.uniform(-80, 80, Ny))
    if decreasing_y:
        y = y[::-1].copy()
    mask = (rng.uniform(size=(Ny, Nx)) > 0.2).astype(np.float64)
    dA = rng.uniform(0.5, 2.0, size=(Ny, Nx))

    tb = np.asarray(core.cal_area_eqCoord_table(
        jnp.asarray(mask), jnp.asarray(y), jnp.asarray(dA),
        increase=increase, lt=lt).values)
    yc, tc = compat.area_table_broadcast(mask, y, dA, increase, lt)
    np.testing.assert_allclose(tb, tc, rtol=1e-10,
                               err_msg=f"seed {seed} broadcast table")

    th = np.asarray(core.cal_area_eqCoord_table_hist(
        jnp.asarray(mask), jnp.asarray(y), jnp.asarray(dA),
        increase=increase, lt=lt).values)
    ych, tch = compat.area_table_hist(mask, y, dA, increase, lt)
    # compat returns ascending order; ours keeps ydef order
    want = tch if not decreasing_y else tch[::-1]
    np.testing.assert_allclose(th, want, rtol=1e-10,
                               err_msg=f"seed {seed} hist table")


@pytest.mark.parametrize("seed", range(8))
def test_lwa_methods_agree(seed):
    """All three LWA execution paths — pairwise ('dense'), linearized
    ('lin'), and sort-merge ('fast') — agree on random fields, NaN
    patterns, weights, flags, and coordinate directions, and match the
    float64 oracle."""
    from xcontour_tpu.diagnostics.lwa import (local_wave_activity,
                                              local_wave_activity2)

    rng = np.random.default_rng(2000 + seed)
    Ny = int(rng.integers(8, 40))
    Nx = int(rng.integers(8, 60))
    increase = bool(rng.integers(0, 2))
    coord_up = bool(rng.integers(0, 2))
    variant2 = bool(rng.integers(0, 2))
    with_nan = bool(rng.integers(0, 2))

    q = rng.normal(size=(Ny, Nx)) * rng.uniform(0.1, 10)
    if with_nan:
        q[rng.uniform(size=q.shape) < 0.1] = np.nan
    dA = rng.uniform(0.5, 2.0, size=(Ny, Nx))
    Q = np.sort(rng.normal(size=Ny) * rng.uniform(0.1, 10))
    if not increase:
        Q = Q[::-1].copy()
    ydef = np.linspace(-80, 80, Ny)
    if not coord_up:
        ydef = ydef[::-1].copy()

    fn = local_wave_activity2 if variant2 else local_wave_activity
    oracle = (compat.local_wave_activity2 if variant2
              else compat.local_wave_activity)
    want = oracle(q, Q, dA, ydef, increase=increase, part="all")
    outs = {}
    for method in ("dense", "lin", "fast"):
        outs[method] = np.asarray(fn(jnp.asarray(q), jnp.asarray(Q),
                                     jnp.asarray(dA), jnp.asarray(ydef),
                                     increase=increase, method=method))
    scale = max(np.nanmax(np.abs(want)), 1.0)
    for method, got in outs.items():
        np.testing.assert_allclose(
            got, want, rtol=1e-8, atol=1e-9 * scale,
            err_msg=f"method={method} seed={seed} inc={increase} "
                    f"up={coord_up} v2={variant2} nan={with_nan}")
