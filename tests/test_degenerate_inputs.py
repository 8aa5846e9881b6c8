"""Degenerate-input behavior: the jitted pipelines must never crash.

The reference's drivers die on these inputs in assorted ways (histogram
edge construction, div-by-zero in the area derivative); here the contract
is: no exception, correct shapes, NaN/0 where the quantity is undefined,
and untouched batch elements unaffected by a degenerate neighbor.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from xcontour_tpu import grid as G
from xcontour_tpu.pipeline import keff_pipeline, lwa_pipeline, clength_pipeline


@pytest.fixture(scope="module")
def small_grid():
    Ny, Nx = 16, 32
    lat = np.linspace(-70, 70, Ny)
    lon = np.linspace(0, 360 - 360 / Nx, Nx)
    return G.from_latlon(lat, lon, dtype=jnp.float64), Ny, Nx


def test_constant_field_does_not_crash(small_grid):
    grid, Ny, Nx = small_grid
    tr = jnp.full((Ny, Nx), 3.5)
    out = keff_pipeline(tr, grid, N=9, increase=True, lt=True,
                        lmin="analytic")
    assert out["origin"]["nkeff"].shape == (9,)
    out2 = lwa_pipeline(tr, grid, N=9, increase=True, lt=True)
    assert out2["lwa"].shape == (Ny, Nx)
    # zero deviation everywhere -> LWA is identically 0 (not NaN)
    lwa = np.asarray(out2["lwa"])
    assert np.nanmax(np.abs(lwa)) == 0.0


def test_all_nan_snapshot_does_not_crash(small_grid):
    grid, Ny, Nx = small_grid
    tr = jnp.full((Ny, Nx), jnp.nan)
    out = lwa_pipeline(tr, grid, N=7, increase=True, lt=True)
    assert out["lwa"].shape == (Ny, Nx)
    out2 = clength_pipeline(tr, grid, N=7, increase=True, lt=True)
    # no contours cross anything: lengths are the empty-contour NaN marker
    assert np.isnan(np.asarray(out2["lengths"])).all()


def test_degenerate_batch_element_is_isolated(small_grid, rng):
    """One constant / one NaN snapshot in a batch must not leak into the
    healthy elements (everything is vmapped per batch element)."""
    grid, Ny, Nx = small_grid
    good = (np.sin(np.deg2rad(np.asarray(grid.ydef)))[:, None]
            + 0.1 * rng.standard_normal((Ny, Nx)))
    batch = np.stack([good, np.full((Ny, Nx), 1.0),
                      np.full((Ny, Nx), np.nan), good * 2.0])
    out = lwa_pipeline(jnp.asarray(batch), grid, N=11, increase=True, lt=True)
    lwa = np.asarray(out["lwa"])
    ref = np.asarray(lwa_pipeline(jnp.asarray(good), grid, N=11,
                                  increase=True, lt=True)["lwa"])
    # batched and single compilations place the per-batch contour levels
    # ~1 ulp apart; through the linearized form's O(total)-scale
    # intermediates that is ~1e-12 of the LWA magnitude, not exact equality
    scale = np.nanmax(np.abs(ref))
    np.testing.assert_allclose(lwa[0], ref, rtol=1e-10, atol=1e-10 * scale)
    assert np.isfinite(lwa[0]).all()


def test_half_masked_ocean_field(small_grid, rng):
    """NaN-masked land: integrals skip masked cells, outputs stay usable."""
    grid, Ny, Nx = small_grid
    tr = (np.sin(np.deg2rad(np.asarray(grid.ydef)))[:, None]
          + 0.1 * rng.standard_normal((Ny, Nx)))
    tr[:, : Nx // 2] = np.nan                       # half the domain is land
    mask = np.isfinite(tr).astype(float)
    out = keff_pipeline(jnp.asarray(tr), grid, mask=jnp.asarray(mask),
                        N=9, increase=True, lt=True, lmin="dxF")
    ia = np.asarray(out["origin"]["intArea"])
    # enclosed area is bounded by the fluid area, not the full sphere band
    fluid_area = float(np.sum(mask * np.asarray(grid.dA)))
    assert np.nanmax(ia) <= fluid_area * (1 + 1e-9)
    assert np.nanmax(ia) > 0
