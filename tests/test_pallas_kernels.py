"""Pallas kernel parity (interpreter mode on the CPU test mesh).

Every Pallas kernel has an XLA twin; these tests pin them together on small
shapes so the TPU fast path is covered without TPU hardware.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from xcontour_tpu import compat
from xcontour_tpu.kernels.lwa_pallas import lwa_pallas
from xcontour_tpu.kernels.hist_pallas import histogram_pallas
from xcontour_tpu.ops.histogram import weighted_cdf


@pytest.mark.parametrize("lt", [True, False])
@pytest.mark.parametrize("decreasing", [False, True])
def test_hist_kernel_matches_oracle(rng, lt, decreasing):
    B, Ny, Nx, N = 2, 16, 24, 13
    v = rng.normal(size=(B, Ny * Nx))
    w = rng.uniform(0.5, 2.0, size=(B, Ny * Nx))
    v[0, 5] = np.nan
    w[1, 7] = np.nan
    outs = []
    for b in range(B):
        bins = np.linspace(np.nanmin(v[b]), np.nanmax(v[b]), N)
        if decreasing:
            bins = bins[::-1].copy()
        outs.append((bins, compat.histogram_cdf(v[b], bins, w[b], lt)))

    # drive through the pallas wrapper path (ascending edges + flip)
    from xcontour_tpu.ops.histogram import _cdf_batched_pallas
    import xcontour_tpu.kernels.hist_pallas as hk
    orig = hk.histogram_pallas_multi
    hk.histogram_pallas_multi = lambda *a, **k: orig(*a, interpret=True, **k)
    try:
        bf = jnp.asarray(np.stack([o[0] for o in outs]))
        got = _cdf_batched_pallas(jnp.asarray(v), bf,
                                  jnp.asarray(np.where(np.isnan(w), 0, w)), lt)
    finally:
        hk.histogram_pallas_multi = orig
    for b in range(B):
        np.testing.assert_allclose(np.asarray(got[b]), outs[b][1], rtol=1e-10,
                                   err_msg=f"b={b}")


@pytest.mark.parametrize("variant2", [False, True])
@pytest.mark.parametrize("increase", [True, False])
@pytest.mark.parametrize("part", ["all", "upper", "lower"])
def test_lwa_kernel_matches_oracle(rng, variant2, increase, part):
    B, Ny, Nx = 2, 24, 16
    ydef = np.linspace(-60, 60, Ny) if increase else -np.linspace(5, 120, Ny)
    q = np.cumsum(rng.normal(size=(B, Ny, Nx)), axis=1)
    q[0, 3, 4] = np.nan
    dA = rng.uniform(0.5, 2.0, size=(Ny, Nx))
    Q = np.sort(rng.normal(size=(B, Ny)), axis=-1)
    W = dA / dA.max() * dA

    fn = compat.local_wave_activity2 if variant2 else compat.local_wave_activity
    want = np.stack([fn(q[b], Q[b], dA, ydef, increase, part)
                     for b in range(B)])
    got = lwa_pallas(jnp.asarray(q), jnp.asarray(Q), jnp.asarray(W),
                     increase=increase, part=part, variant2=variant2,
                     tile_j=8, interpret=True)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-9, atol=1e-9)


def test_lwa_kernel_ragged_tile(rng):
    """Ny not divisible by tile_j exercises the j < ny guard."""
    B, Ny, Nx = 1, 13, 8
    ydef = np.linspace(-60, 60, Ny)
    q = rng.normal(size=(B, Ny, Nx))
    dA = np.ones((Ny, Nx))
    Q = np.sort(rng.normal(size=(B, Ny)), axis=-1)
    want = compat.local_wave_activity(q[0], Q[0], dA, ydef, True, "all")
    got = lwa_pallas(jnp.asarray(q), jnp.asarray(Q), jnp.asarray(dA / 1.0),
                     increase=True, part="all", tile_j=8, interpret=True)
    np.testing.assert_allclose(np.asarray(got[0]), want, rtol=1e-9, atol=1e-9)


def test_weighted_cdf_pallas_switch(rng):
    """The engine produces identical results through both backends."""
    from xcontour_tpu import config
    v = rng.normal(size=(3, 10, 12))
    w = rng.uniform(0.5, 2.0, size=(10, 12))
    bins = np.linspace(v.min(), v.max(), 9)
    want = weighted_cdf(jnp.asarray(v), jnp.asarray(bins), jnp.asarray(w), True)
    import xcontour_tpu.kernels.hist_pallas as hk
    orig = hk.histogram_pallas_multi
    hk.histogram_pallas_multi = lambda *a, **k: orig(*a, interpret=True, **k)
    config.set_use_pallas(True)
    try:
        got = weighted_cdf(jnp.asarray(v), jnp.asarray(bins), jnp.asarray(w),
                           True)
    finally:
        config.set_use_pallas(None)
        hk.histogram_pallas_multi = orig
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-10)


def test_lwa_kernel_x_blocking(rng):
    """Wide grids split into x panels with NaN padding; results match the
    unblocked oracle exactly (the surface reduction is x-separable)."""
    import importlib
    # kernels/__init__ rebinds the attribute to the function; fetch the module
    lk = importlib.import_module("xcontour_tpu.kernels.lwa_pallas")
    B, Ny, Nx = 1, 16, 200   # forces pad with a small budget
    ydef = np.linspace(-60, 60, Ny)
    q = rng.normal(size=(B, Ny, Nx))
    dA = rng.uniform(0.5, 2.0, size=(Ny, Nx))
    Q = np.sort(rng.normal(size=(B, Ny)), axis=-1)
    W = dA / dA.max() * dA
    want = compat.local_wave_activity(q[0], Q[0], dA, ydef, True, "all")
    orig = lk._VMEM_BUDGET
    lk._VMEM_BUDGET = 16 * 128 * 8 * 4  # tiny: forces nxb=128 panels w/ pad
    try:
        got = lwa_pallas(jnp.asarray(q), jnp.asarray(Q), jnp.asarray(W),
                         increase=True, part="all", interpret=True)
    finally:
        lk._VMEM_BUDGET = orig
    np.testing.assert_allclose(np.asarray(got[0]), want, rtol=1e-9, atol=1e-9)


@pytest.mark.parametrize("latlon", [True, False])
def test_length_kernel_matches_oracle(rng, latlon):
    from xcontour_tpu.kernels.length_pallas import contour_lengths_pallas
    B, Ny, Nx, N = 2, 20, 30, 9
    if latlon:
        y = np.linspace(-60, 60, Ny)
        x = np.linspace(0, 348, Nx)
    else:
        y = np.linspace(0.0, 1900.0, Ny)
        x = np.linspace(0.0, 2900.0, Nx)
    d = np.cumsum(rng.normal(size=(B, Ny, Nx)), axis=1)
    d[0, 4, 7] = np.nan
    levels = np.stack([np.linspace(np.nanmin(d[b]), np.nanmax(d[b]), N)
                       for b in range(B)])
    yc = np.deg2rad(y) if latlon else y
    xc = np.deg2rad(x) if latlon else x
    got = np.asarray(contour_lengths_pallas(
        jnp.asarray(d), jnp.asarray(levels), jnp.asarray(yc), jnp.asarray(xc),
        latlon=latlon, interpret=True))
    for b in range(B):
        want = compat.contour_lengths(d[b], levels[b], y, x, latlon=latlon,
                                      Rearth=1.0 if latlon else None) \
            if latlon else compat.contour_lengths(d[b], levels[b], y, x,
                                                  latlon=False)
        want = np.where(np.isnan(want), 0.0, want)
        np.testing.assert_allclose(got[b], want, rtol=1e-6, atol=1e-9,
                                   err_msg=f"b={b} latlon={latlon}")


@pytest.mark.parametrize("variant2", [False, True])
def test_lwa_kernel_y_blocking(rng, variant2):
    """Tall-grid path: the y reduction accumulates across row blocks; with a
    tiny budget and row-block override the multi-block path reproduces the
    oracle exactly."""
    import importlib
    lk = importlib.import_module("xcontour_tpu.kernels.lwa_pallas")
    B, Ny, Nx = 1, 48, 40
    ydef = np.linspace(-60, 60, Ny)
    q = np.cumsum(rng.normal(size=(B, Ny, Nx)), axis=1)
    q[0, 5, 3] = np.nan
    dA = rng.uniform(0.5, 2.0, size=(Ny, Nx))
    Q = np.sort(rng.normal(size=(B, Ny)), axis=-1)
    W = dA / dA.max() * dA
    fn = compat.local_wave_activity2 if variant2 else compat.local_wave_activity
    want = fn(q[0], Q[0], dA, ydef, True, "all")
    orig_b, orig_yb = lk._VMEM_BUDGET, lk._YB
    lk._VMEM_BUDGET = 1  # force the y-blocked path with minimum panels
    lk._YB = 16          # 3 row blocks over Ny=48
    try:
        got = lwa_pallas(jnp.asarray(q), jnp.asarray(Q), jnp.asarray(W),
                         increase=True, part="all", variant2=variant2,
                         interpret=True)
    finally:
        lk._VMEM_BUDGET, lk._YB = orig_b, orig_yb
    np.testing.assert_allclose(np.asarray(got[0]), want, rtol=1e-9, atol=1e-9)


def test_multi_channel_cdf_matches_single(rng):
    from xcontour_tpu.kernels.hist_pallas import (histogram_pallas_multi,
                                                  histogram_pallas)
    B, G, N = 2, 500, 11
    v = rng.normal(size=(B, G))
    v[0, 3] = np.nan
    w = rng.uniform(0.5, 2.0, size=(B, 3, G))
    w[1, 2, 5] = np.nan
    edges = np.stack([np.linspace(np.nanmin(v[b]) - 0.5, np.nanmax(v[b]),
                                  N + 1) for b in range(B)])
    got = np.asarray(histogram_pallas_multi(
        jnp.asarray(v), jnp.asarray(edges), jnp.asarray(w), interpret=True))
    for c in range(3):
        want = np.asarray(histogram_pallas(
            jnp.asarray(v), jnp.asarray(edges), jnp.asarray(w[:, c]),
            interpret=True))
        np.testing.assert_allclose(got[:, c], want, rtol=1e-12,
                                   err_msg=f"channel {c}")


@pytest.mark.parametrize("periodic", [True, False])
@pytest.mark.parametrize("bc_y", ["extend", "reflect"])
def test_stencil_kernel_matches_xla(rng, periodic, bc_y):
    from xcontour_tpu.kernels.stencil_pallas import squared_gradient_pallas
    from xcontour_tpu.ops.stencil import gradient, _spacing
    from xcontour_tpu import grid as G
    Ny, Nx = 24, 32
    lat = np.linspace(-70, 70, Ny)
    lon = np.linspace(0, 360 - 360 / Nx, Nx) if periodic else \
        np.linspace(0, 180, Nx)
    grid = G.from_latlon(lat, lon, dtype=jnp.float64)
    assert grid.periodic_x == periodic
    q = rng.normal(size=(2, Ny, Nx))
    dy, dx = _spacing(grid, jnp.float64)
    got = np.asarray(squared_gradient_pallas(
        jnp.asarray(q), jnp.broadcast_to(dx, (Ny, Nx)),
        jnp.asarray(np.asarray(dy)[:, None]), periodic_x=periodic, bc_y=bc_y,
        interpret=True))
    qy, qx = gradient(jnp.asarray(q), grid, bc_y=bc_y)
    want = np.asarray(qx * qx + qy * qy)
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_length_kernel_coarse_cells_series_margin(rng):
    """The offset-form geodesics use small-angle Maclaurin series whose
    domain must cover the COARSEST cells any workload produces — the fractal
    ladder coarsens the 0.7-degree global grid by strides up to 32, i.e.
    ~22.5-degree (0.39 rad) cells.  Pin f64 interpreter parity vs the
    reference-haversine oracle at that scale so a truncated term can't
    silently reappear."""
    from xcontour_tpu.kernels.length_pallas import contour_lengths_pallas
    Ny, Nx, N = 9, 17, 7                      # 22.5 x 22.5 degree cells
    y = np.linspace(-90, 90, Ny)
    x = np.linspace(0, 360, Nx)
    d = np.cumsum(rng.normal(size=(Ny, Nx)), axis=0) \
        + 0.5 * rng.normal(size=(Ny, Nx))
    levels = np.linspace(d.min(), d.max(), N)
    got = np.asarray(contour_lengths_pallas(
        jnp.asarray(d[None]), jnp.asarray(levels[None]),
        jnp.asarray(np.deg2rad(y)), jnp.asarray(np.deg2rad(x)),
        latlon=True, interpret=True))[0]
    want = compat.contour_lengths(d, levels, y, x, latlon=True, Rearth=1.0)
    want = np.where(np.isnan(want), 0.0, want)
    np.testing.assert_allclose(got, want, rtol=2e-7, atol=1e-12)


def test_local_length_kernel_coarse_cells_series_margin(rng):
    """Same truncation guard for the per-window kernel (shares the offset
    geometry helpers)."""
    from xcontour_tpu.kernels.length_pallas import local_lengths_pallas
    W = 9
    y = np.linspace(-80, 80, W)
    x = np.linspace(10, 190, W)               # 20 x 22.5 degree cells
    nw = 3
    patches = np.cumsum(rng.normal(size=(nw, W, W)), axis=1)
    lv = np.asarray([np.mean(p) for p in patches])
    got = np.asarray(local_lengths_pallas(
        jnp.asarray(patches), jnp.asarray(lv),
        jnp.asarray(np.deg2rad(np.tile(y, (nw, 1)))),
        jnp.asarray(np.deg2rad(np.tile(x, (nw, 1)))),
        latlon=True, interpret=True))
    for k in range(nw):
        want = compat.contour_lengths(patches[k], lv[k:k + 1], y, x,
                                      latlon=True, Rearth=1.0)[0]
        want = 0.0 if np.isnan(want) else want
        np.testing.assert_allclose(got[k], want, rtol=2e-7, atol=1e-12)


def test_length_kernel_level_order_invariance(rng):
    """The kernel sorts levels internally and unsorts the results — a
    decreasing or shuffled level vector (increase=False contours) must give
    the exact permutation of the ascending answer."""
    from xcontour_tpu.kernels.length_pallas import contour_lengths_pallas
    Ny, Nx, N = 20, 30, 9
    y = np.linspace(-60, 60, Ny)
    x = np.linspace(0, 348, Nx)
    d = np.cumsum(rng.normal(size=(1, Ny, Nx)), axis=1)
    up = np.linspace(d.min(), d.max(), N)
    perm = rng.permutation(N)
    args = (jnp.asarray(np.deg2rad(y)), jnp.asarray(np.deg2rad(x)))
    ref = np.asarray(contour_lengths_pallas(
        jnp.asarray(d), jnp.asarray(up[None]), *args, latlon=True,
        interpret=True))[0]
    down = np.asarray(contour_lengths_pallas(
        jnp.asarray(d), jnp.asarray(up[::-1].copy()[None]), *args,
        latlon=True, interpret=True))[0]
    shuf = np.asarray(contour_lengths_pallas(
        jnp.asarray(d), jnp.asarray(up[perm][None]), *args, latlon=True,
        interpret=True))[0]
    np.testing.assert_array_equal(down, ref[::-1])
    np.testing.assert_array_equal(shuf, ref[perm])


@pytest.mark.parametrize("variant2", [False, True])
@pytest.mark.parametrize("increase", [True, False])
def test_lwa_linearized_kernel_matches_oracle(rng, variant2, increase):
    """The opt-in linearized kernels (pairwise=False — what method='lin'
    runs on TPU) reproduce the pairwise oracle for BOTH variants: NaN
    tracer cells zero their output cell, NaN profile rows integrate to
    zero, and the fused in-kernel E prefix matches the reference summation
    (in f64 the R/E cancellation noise is ~1e-12)."""
    B, Ny, Nx = 2, 24, 16
    ydef = np.linspace(-60, 60, Ny) if increase else -np.linspace(5, 120, Ny)
    q = np.cumsum(rng.normal(size=(B, Ny, Nx)), axis=1)
    q[0, 3, 4] = np.nan
    dA = rng.uniform(0.5, 2.0, size=(Ny, Nx))
    Q = np.sort(rng.normal(size=(B, Ny)), axis=-1)
    Q[1, 5] = np.nan                      # invalid profile row
    W = dA / dA.max() * dA

    fn = compat.local_wave_activity2 if variant2 else compat.local_wave_activity
    want = np.stack([fn(q[b], Q[b], dA, ydef, increase, "all")
                     for b in range(B)])
    want = np.where(np.isnan(want), 0.0, want)
    got = lwa_pallas(jnp.asarray(q), jnp.asarray(Q), jnp.asarray(W),
                     increase=increase, part="all", variant2=variant2,
                     interpret=True, pairwise=False)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-8, atol=1e-8)


@pytest.mark.parametrize("variant2", [False, True])
def test_lwa_linearized_kernel_x_blocking(rng, variant2):
    """The linearized kernels' NaN/zero x-padding panels contribute nothing
    (pad cells are NaN in q and 0 in W)."""
    import importlib
    lk = importlib.import_module("xcontour_tpu.kernels.lwa_pallas")
    B, Ny, Nx = 1, 16, 200
    ydef = np.linspace(-60, 60, Ny)
    q = np.cumsum(rng.normal(size=(B, Ny, Nx)), axis=1)
    dA = rng.uniform(0.5, 2.0, size=(Ny, Nx))
    Q = np.sort(rng.normal(size=(B, Ny)), axis=-1)
    W = dA / dA.max() * dA
    fn = compat.local_wave_activity2 if variant2 else compat.local_wave_activity
    want = fn(q[0], Q[0], dA, ydef, True, "all")
    orig = lk._VMEM_BUDGET
    lk._VMEM_BUDGET = 16 * 128 * 8 * 4  # tiny: forces nxb=128 panels w/ pad
    try:
        got = lwa_pallas(jnp.asarray(q), jnp.asarray(Q), jnp.asarray(W),
                         increase=True, part="all", variant2=variant2,
                         interpret=True, pairwise=False)
    finally:
        lk._VMEM_BUDGET = orig
    np.testing.assert_allclose(np.asarray(got[0]), want, rtol=1e-8, atol=1e-8)


@pytest.mark.parametrize("lt", [True, False])
@pytest.mark.parametrize("decreasing", [False, True])
def test_weighted_cdf_multi_pallas_branch(rng, lt, decreasing):
    """weighted_cdf_multi's shared-digitize Pallas route == the per-channel
    XLA loop, including the descending-bin reversal and the lt=False
    total-minus-CDF flip."""
    from xcontour_tpu import config
    from xcontour_tpu.ops.histogram import weighted_cdf_multi
    import xcontour_tpu.kernels.hist_pallas as hk

    v = rng.normal(size=(3, 10, 12))
    ws = [rng.uniform(0.5, 2.0, size=(10, 12)),
          rng.uniform(0.0, 1.0, size=(3, 10, 12))]
    bins = np.linspace(v.min(), v.max(), 9)
    if decreasing:
        bins = bins[::-1].copy()
    vj = jnp.asarray(v)
    bj = jnp.asarray(bins)
    wj = [jnp.asarray(w) for w in ws]
    want = weighted_cdf_multi(vj, bj, wj, lt)          # pallas off: XLA loop

    orig = hk.histogram_pallas_multi
    hk.histogram_pallas_multi = lambda *a, **k: orig(*a, interpret=True, **k)
    config.set_use_pallas(True)
    try:
        got = weighted_cdf_multi(vj, bj, wj, lt)
    finally:
        config.set_use_pallas(None)
        hk.histogram_pallas_multi = orig
    assert len(got) == len(want) == 2
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=1e-12, atol=1e-12)


def test_stencil_pallas_ad_path(rng):
    """squared_gradient's Pallas route carries the XLA twin's VJP: value
    matches the XLA form and jax.grad through it equals the XLA gradient
    exactly (the custom VJP calls the twin)."""
    import jax
    from xcontour_tpu import config
    from xcontour_tpu import grid as G
    import xcontour_tpu.kernels.stencil_pallas as sp
    from xcontour_tpu.ops import stencil as st

    Ny, Nx = 16, 24
    grid = G.from_latlon(np.linspace(-75, 75, Ny),
                         np.arange(Nx) * (360.0 / Nx), dtype=jnp.float64)
    q = jnp.asarray(rng.normal(size=(2, Ny, Nx)))
    dy, dx = st._spacing(grid, q.dtype)

    def loss_xla(t):
        return jnp.sum(st._squared_gradient_xla(
            t, dy, dx, periodic_x=grid.periodic_x, bc_y=grid.bc_y) ** 2)

    want_v = st._squared_gradient_xla(q, dy, dx, periodic_x=grid.periodic_x,
                                      bc_y=grid.bc_y)
    want_g = jax.grad(loss_xla)(q)

    orig = sp.squared_gradient_pallas
    sp.squared_gradient_pallas = lambda *a, **k: orig(*a, interpret=True, **k)
    config.set_use_pallas(True)
    try:
        assert sp.pallas_ok(q)
        got_v = st.squared_gradient(q, grid)

        def loss_p(t):
            return jnp.sum(st.squared_gradient(t, grid) ** 2)

        got_g = jax.grad(loss_p)(q)
    finally:
        config.set_use_pallas(None)
        sp.squared_gradient_pallas = orig
    np.testing.assert_allclose(np.asarray(got_v), np.asarray(want_v),
                               rtol=1e-12, atol=1e-15)
    # the cotangent 2*out is built from the (last-ulp different) Pallas
    # forward value, so the grads agree to rounding, not bit-for-bit
    np.testing.assert_allclose(np.asarray(got_g), np.asarray(want_g),
                               rtol=1e-10, atol=1e-30)


@pytest.mark.parametrize("variant2", [False, True])
def test_lwa_linearized_kernel_inf_matches_xla_twin(rng, variant2):
    """+/-inf tracer/weight cells: the lin family treats them as invalid
    (zeroed), and the Pallas forward must agree with _lwa_lin_xla — the
    function its custom VJP differentiates — or grads detach from the
    primal."""
    from xcontour_tpu.diagnostics.lwa import _lwa_lin_xla
    B, Ny, Nx = 2, 16, 12
    q = np.cumsum(rng.normal(size=(B, Ny, Nx)), axis=1)
    q[0, 4, 2] = np.inf
    q[1, 7, 5] = -np.inf
    q[0, 9, 9] = np.nan
    dA = rng.uniform(0.5, 2.0, size=(Ny, Nx))
    W = dA / dA.max() * dA
    W[3, 3] = np.inf
    Q = np.sort(rng.normal(size=(B, Ny)), axis=-1)

    want = np.asarray(_lwa_lin_xla(jnp.asarray(q), jnp.asarray(Q),
                                   jnp.asarray(W), True, variant2, 0))
    got = np.asarray(lwa_pallas(jnp.asarray(q), jnp.asarray(Q),
                                jnp.asarray(W), increase=True, part="all",
                                variant2=variant2, interpret=True,
                                pairwise=False))
    assert np.isfinite(got).all()
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-9)
