"""σ-weighted (isentropic-density) production LWA parity.

The reference's production driver (tests/LWA.py:46-88) sorts the COMPOSITION
tracer = σ·q (σ = isentropic density), integrates area with integrand 1, and
normalizes LWA by the earth-circle perimeter 2πR·cos(lat).  Round-2 only ever
exercised σ = 1; this module pins the full non-unit-σ composition against the
float64 oracle (compat.lwa_production_snapshot) so sign/weight bugs in the
composition cannot hide.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from xcontour_tpu import compat
from xcontour_tpu import grid as G
from xcontour_tpu.pipeline import lwa_pipeline
from xcontour_tpu.utils import synth
from xcontour_tpu.utils.constants import Rearth


@pytest.fixture(scope="module")
def sigma_case():
    """Synthetic isentropic stack (level, lat, lon) with a NON-UNIT
    σ(level, lat): a density-like profile decreasing poleward and varying
    across levels (the shape -dp/dθ/g takes on real isentropes)."""
    v, _ = synth.synth_pv(nlev=3, nlat=73, nlon=128)
    pv = np.asarray(v["pv"], np.float64)
    lat = np.asarray(v["latitude"], np.float64)
    lon = np.asarray(v["longitude"], np.float64)
    lev = np.arange(pv.shape[0], dtype=np.float64)
    sigma = (120.0 * (1.0 + 0.5 * np.cos(np.deg2rad(lat))[None, :] ** 2)
             * (1.0 - 0.15 * lev[:, None]))[..., None]    # (lev, lat, 1)
    sigma = np.broadcast_to(sigma, pv.shape).copy()
    return pv, sigma, lat, lon


def test_sigma_weighted_lwa_matches_oracle(sigma_case):
    """tracer = σ·q, integrand 1, earth-perimeter normalization: the jitted
    pipeline on the composed tracer must match the reference-semantics f64
    oracle at 1e-6 relative, per level."""
    pv, sigma, lat, lon = sigma_case
    grid = G.from_latlon(lat, lon, dtype=jnp.float64)
    N = lat.size
    composed = jnp.asarray(sigma * pv, jnp.float64)
    out = lwa_pipeline(composed, grid, N=N, increase=True, lt=True,
                       lwa_method="dense")
    perim = compat.latitude_lengths_at(lat)
    got_lwa = np.asarray(out["lwa"])
    got_norm = got_lwa / perim[None, :, None]

    dA = np.asarray(grid.dA, np.float64)
    mask = np.ones_like(pv[0])
    for L in range(pv.shape[0]):
        want = compat.lwa_production_snapshot(pv[L], sigma[L], lat, dA, mask,
                                              N=N, increase=True, lt=True)
        scale = np.nanmax(np.abs(want["lwa"]))
        np.testing.assert_allclose(got_lwa[L], want["lwa"], rtol=1e-6,
                                   atol=1e-6 * scale)
        np.testing.assert_allclose(got_norm[L], want["lwa_norm"], rtol=1e-6,
                                   atol=1e-6 * np.nanmax(np.abs(want["lwa_norm"])))
        np.testing.assert_allclose(np.asarray(out["Q"][L]), want["Q"],
                                   rtol=1e-6, atol=1e-9)


def test_sigma_weighting_changes_the_answer(sigma_case):
    """Guard against a silently-dropped σ: the composed run must differ from
    the unweighted run by far more than the parity tolerance."""
    pv, sigma, lat, lon = sigma_case
    grid = G.from_latlon(lat, lon, dtype=jnp.float64)
    N = lat.size
    with_sigma = np.asarray(lwa_pipeline(
        jnp.asarray(sigma * pv), grid, N=N, increase=True, lt=True)["lwa"])
    without = np.asarray(lwa_pipeline(
        jnp.asarray(pv), grid, N=N, increase=True, lt=True)["lwa"])
    denom = np.nanmax(np.abs(with_sigma))
    rel = np.nanmax(np.abs(with_sigma - np.nanmean(sigma) * without)) / denom
    assert rel > 1e-2     # a real composition, not a global rescale


def test_sigma_production_normalization_units(sigma_case):
    """lwa_norm = lwa / (2πR·cos φ) (tests/LWA.py:22,80): reconstructing the
    perimeter from the two outputs must give exactly 2πR·cosφ."""
    pv, sigma, lat, lon = sigma_case
    perim = compat.latitude_lengths_at(lat)
    dA = np.ones((lat.size, lon.size))
    out = compat.lwa_production_snapshot(pv[0], sigma[0], lat, dA,
                                         np.ones_like(pv[0]), N=lat.size)
    with np.errstate(invalid="ignore", divide="ignore"):
        ratio = out["lwa"] / out["lwa_norm"]
    ok = np.isfinite(ratio)
    np.testing.assert_allclose(ratio[ok],
                               np.broadcast_to(perim[:, None],
                                               ratio.shape)[ok], rtol=1e-9)
    assert abs(perim[lat.size // 2] - 2 * np.pi * Rearth *
               np.cos(np.deg2rad(lat[lat.size // 2]))) < 1e-6
