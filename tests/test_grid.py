"""Grid-metric correctness: exact spherical invariants."""

import numpy as np
import jax.numpy as jnp
import pytest

from xcontour_tpu import grid as G
from xcontour_tpu.utils.constants import Rearth


def test_global_area_sums_to_sphere(vorticity):
    lat, lon, _ = vorticity
    g = G.from_latlon(lat, lon, dtype=jnp.float64)
    total = float(np.sum(np.asarray(g.dA)))
    sphere = 4.0 * np.pi * Rearth ** 2
    # edge cells extrapolate past the gaussian-grid poles, then clamp: the
    # remaining mismatch is < 0.1% of the sphere
    assert abs(total - sphere) / sphere < 1e-3
    assert g.periodic_x
    assert g.latlon


def test_band_area_exact():
    lat = np.linspace(-80, 80, 9)
    lon = np.linspace(0, 350, 36)
    g = G.from_latlon(lat, lon, dtype=jnp.float64)
    # row areas must equal the analytic band area R^2 (sin top - sin bot) dlam
    dA = np.asarray(g.dA)
    latE = np.zeros(10)
    latE[1:-1] = 0.5 * (lat[:-1] + lat[1:])
    latE[0] = lat[0] - 10
    latE[-1] = lat[-1] + 10
    d2r = np.pi / 180
    for j in [2, 4, 6]:
        want = Rearth**2 * (np.sin(latE[j+1]*d2r) - np.sin(latE[j]*d2r)) * 10 * d2r
        np.testing.assert_allclose(dA[j, 5], want, rtol=1e-12)


def test_latitude_lengths_and_equivalent_latitudes():
    lats = jnp.asarray([0.0, 30.0, 60.0], jnp.float64)
    L = np.asarray(G.latitude_lengths_at(lats))
    np.testing.assert_allclose(L[0], 2 * np.pi * Rearth, rtol=1e-12)
    np.testing.assert_allclose(L[2], 2 * np.pi * Rearth * 0.5, rtol=1e-9)

    # half the sphere's area -> equator; full area -> north pole
    areas = jnp.asarray([2 * np.pi * Rearth**2, 4 * np.pi * Rearth**2], jnp.float64)
    eq = np.asarray(G.equivalent_latitudes(areas))
    np.testing.assert_allclose(eq, [0.0, 90.0], atol=1e-6)


def test_cartesian_grid():
    y = np.linspace(0, 100, 11)
    x = np.linspace(0, 200, 21)
    g = G.from_cartesian(y, x, dtype=jnp.float64)
    np.testing.assert_allclose(np.asarray(g.dA), 100.0)
    np.testing.assert_allclose(float(g.total_area()), 110 * 210, rtol=1e-12)


def test_xz_grid_partial_cells():
    z = np.array([-5.0, -15.0, -25.0])
    x = np.linspace(1.0, 9.0, 5)
    hf = np.ones((3, 5))
    hf[-1, :] = 0.5  # partial bottom cells
    g = G.from_xz(z, x, hFacC=hf, dtype=jnp.float64)
    dA = np.asarray(g.dA)
    np.testing.assert_allclose(dA[0, 0], 10.0 * 2.0, rtol=1e-12)
    np.testing.assert_allclose(dA[-1, 0], 10.0 * 0.5 * 2.0, rtol=1e-12)


def test_descending_latitude_metrics_positive():
    """ERA5-convention files store latitude 90..-90: every metric is a
    length/area and must stay positive (a signed dyF sign-flips the LWA
    'dy' metric); metrics equal the ascending grid's, row-flipped."""
    lat_a = np.linspace(-88.0, 88.0, 23)
    lon = np.arange(16) * 22.5
    up = G.from_latlon(lat_a, lon, dtype=jnp.float64)
    # the descending-orientation warning is the POINT of these inputs —
    # assert it fires instead of letting it pollute the suite summary
    with pytest.warns(UserWarning, match="DESCENDING"):
        dn = G.from_latlon(lat_a[::-1].copy(), lon, dtype=jnp.float64)
    for name in ("dyF", "dxF", "dA"):
        v = np.asarray(getattr(dn, name))
        assert (v >= 0).all(), name
        np.testing.assert_allclose(v, np.asarray(getattr(up, name))[::-1],
                                   rtol=1e-12, err_msg=name)
    with pytest.warns(UserWarning, match="DESCENDING"):
        legacy = G.from_latlon(lat_a[::-1].copy(), lon, exact_area=False,
                               dtype=jnp.float64)
    assert (np.asarray(legacy.dA) > 0).all()


def test_descending_latitude_warns():
    import warnings
    lat = np.linspace(88.0, -88.0, 23)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        G.from_latlon(lat, np.arange(16) * 22.5)
    assert any("DESCENDING" in str(x.message) for x in w)
