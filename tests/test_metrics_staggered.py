"""Staggered-metric fidelity: the exact reference construction.

Pins the interp-derived distances, the edge-latitude areas, and the MITgcm
completion (reference utils.py:118-208 and utils.py:418-488) against
independent closed-form oracles on synthetic grids — not against the
implementation's own helpers.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from xcontour_tpu.metrics import (build_latlon_metrics,
                                  complete_mitgcm_metrics, interp_cgrid,
                                  validate_boundary)

R = 6371200.0
D2R = np.pi / 180.0


def _uniform_global(ny=36, nx=72):
    dlat = 180.0 / ny
    dlon = 360.0 / nx
    lat = -90.0 + dlat / 2 + dlat * np.arange(ny)
    lon = dlon / 2 + dlon * np.arange(nx)
    return lat, lon, dlat, dlon


class TestLatlonStaggered:
    def test_distances_closed_form_uniform(self):
        """On a uniform global grid every staggered distance has a closed
        form: dx* = R cos(phi_*) dlon, dy* = R dlat (utils.py:166-172)."""
        lat, lon, dlat, dlon = _uniform_global()
        m = build_latlon_metrics(lat, lon, periodic_x=True)
        latG = lat - dlat / 2  # left (southern) edges

        cosC = np.abs(np.cos(lat * D2R))
        cosG = np.abs(np.cos(latG * D2R))
        scale = dlon * D2R * R
        ones = np.ones((1, lon.size))
        np.testing.assert_allclose(m["dxC"], cosC[:, None] * scale * ones,
                                   atol=1e-6)
        np.testing.assert_allclose(m["dxG"], cosG[:, None] * scale * ones,
                                   atol=1e-6)
        # dxF = Y-interp of dxG: mean of the two bounding edge rows, last row
        # extended (xgcm 'extend' ghost; utils.py:169)
        want = 0.5 * (cosG + np.append(cosG[1:], cosG[-1])) * scale
        np.testing.assert_allclose(m["dxF"], want[:, None] * ones, atol=1e-6)
        # dxV = X-interp of dxG: uniform lon => unchanged
        np.testing.assert_allclose(m["dxV"], m["dxG"], atol=1e-9)
        for k in ("dyG", "dyF", "dyC", "dyU"):
            np.testing.assert_allclose(
                m[k], np.full((lat.size, lon.size), dlat * D2R * R),
                rtol=1e-12, err_msg=k)

    def test_areas_closed_form_uniform(self):
        """rA/rAw: band between cell edges; rAs/rAz: band between adjacent
        centers, row 0 extrapolated (utils.py:179-208)."""
        lat, lon, dlat, dlon = _uniform_global()
        m = build_latlon_metrics(lat, lon, periodic_x=True)
        latG = lat - dlat / 2
        latGc = np.clip(latG, -90, 90)
        top = np.clip(latG + dlat, -90, 90)
        ones = np.ones((1, lon.size))
        bandC = np.abs(np.sin(top * D2R) - np.sin(latGc * D2R))
        wantA = R * R * bandC[:, None] * (dlon * D2R) * ones
        np.testing.assert_allclose(m["rA"], wantA, rtol=1e-12)
        np.testing.assert_allclose(m["rAw"], wantA, rtol=1e-12)
        lo = np.clip(lat - dlat, -90, 90)   # pole clamp (utils.py:199-204)
        bandG = np.abs(np.sin(lat * D2R) - np.sin(lo * D2R))
        wantS = R * R * bandG[:, None] * (dlon * D2R) * ones
        np.testing.assert_allclose(m["rAs"], wantS, rtol=1e-12)
        np.testing.assert_allclose(m["rAz"], wantS, rtol=1e-12)

    def test_sphere_closure_exact(self):
        """With pole clamping, rA and rAw tile the sphere exactly."""
        lat, lon, _, _ = _uniform_global(45, 90)
        m = build_latlon_metrics(lat, lon, periodic_x=True)
        sphere = 4 * np.pi * R * R
        np.testing.assert_allclose(m["rA"].sum(), sphere, rtol=1e-12)
        np.testing.assert_allclose(m["rAw"].sum(), sphere, rtol=1e-12)

    def test_periodic_wrap_nonuniform_lon(self):
        """dlonC at i=0 wraps across the seam (utils.py:129-138): for lon
        centers [0.5, 1.5, ..., 359.5] the wrapped spacing is 1 degree."""
        lat = np.linspace(-60, 60, 7)
        lon = np.arange(0.5, 360.0, 1.0)
        m = build_latlon_metrics(lat, lon, periodic_x=True)
        # dxC col 0 uses lon[0]-lon[-1]+360 = 1 deg, same as interior cols
        np.testing.assert_allclose(m["dxC"][:, 0], m["dxC"][:, 1], rtol=1e-12)

    def test_nonperiodic_endpoint_fix(self):
        """Non-periodic X: the boundary diff is zero and gets replaced by the
        second element (utils.py:143-152 'mini-dong' fix)."""
        lat = np.linspace(-30, 30, 5)
        lon = np.linspace(10, 50, 9)          # regional, not periodic
        m = build_latlon_metrics(lat, lon, periodic_x=False)
        np.testing.assert_allclose(m["dxC"][:, 0], m["dxC"][:, 1], rtol=1e-12)

    def test_nonuniform_lat_rAs_uses_center_band(self):
        """Non-uniform latitudes separate rA (edge band) from rAs (center
        band): both must match their own closed form (utils.py:196-207)."""
        lat = np.array([-45.0, -15.0, 5.0, 20.0, 50.0])
        lon = np.linspace(0, 350, 36)
        m = build_latlon_metrics(lat, lon, periodic_x=True)
        dlatC = lat - np.roll(lat, 1)
        dlatC[0] = dlatC[1]                   # endpoint fix
        bandG = np.abs(np.sin(lat * D2R) - np.sin((lat - dlatC) * D2R))
        dlon = 10.0
        np.testing.assert_allclose(
            m["rAs"],
            R * R * bandG[:, None] * (dlon * D2R) * np.ones((1, lon.size)),
            rtol=1e-12)


class TestBoundaryWiring:
    def test_invalid_boundary_raises(self):
        with pytest.raises(ValueError, match="unsupported boundary"):
            validate_boundary({"Y": "bogus"})
        with pytest.raises(ValueError, match="unknown boundary axis"):
            validate_boundary({"Q": "extend"})

    def test_latlon_boundary_selects_stencil_bc(self, vorticity):
        """boundary={'Y': 'reflect'} must flow into the gradient stencil:
        wall rows get zero meridional derivative (reference threads boundary
        into the xgcm grid, utils.py:96-116)."""
        from xcontour_tpu.xcontour import add_latlon_metrics
        from xcontour_tpu.ops.stencil import squared_gradient
        from xcontour_tpu.utils.ncio import Dataset
        lat, lon, vor = vorticity
        ds = Dataset(variables=dict(latitude=lat, longitude=lon),
                     dims=dict(latitude=("latitude",),
                               longitude=("longitude",)))
        _, g_ext = add_latlon_metrics(ds, dtype=jnp.float64)
        _, g_ref = add_latlon_metrics(ds, boundary={"Y": "reflect"},
                                      dtype=jnp.float64)
        assert g_ext.bc_y == "extend" and g_ref.bc_y == "reflect"
        q = jnp.asarray(vor, jnp.float64)
        s_ext = np.asarray(squared_gradient(q, g_ext))
        s_ref = np.asarray(squared_gradient(q, g_ref))
        # interior identical, wall rows differ (reflect kills dq/dy there)
        np.testing.assert_allclose(s_ext[1:-1], s_ref[1:-1], rtol=1e-12)
        # vorticity gradients are O(1e-12); compare without absolute slack
        assert not np.allclose(s_ext[0], s_ref[0], rtol=1e-3, atol=0.0)

    def test_contour2d_rejects_unknown_arakawa(self, vorticity):
        from xcontour_tpu import grid as G
        from xcontour_tpu.core import Contour2D
        lat, lon, vor = vorticity
        grid = G.from_latlon(lat, lon)
        with pytest.raises(ValueError, match="arakawa"):
            Contour2D(grid, jnp.asarray(vor), arakawa="B")
        an = Contour2D(grid, jnp.asarray(vor), arakawa="C")
        assert an.arakawa == "C"


class TestInterpCgrid:
    def test_directions_and_bcs(self):
        f = np.array([1.0, 2.0, 4.0, 8.0])
        # left -> center: avg(f[i], f[i+1]); extend ghost at the end
        np.testing.assert_allclose(
            interp_cgrid(f, 0, "left"), [1.5, 3.0, 6.0, 8.0])
        # center -> left: avg(f[i-1], f[i]); extend ghost at the start
        np.testing.assert_allclose(
            interp_cgrid(f, 0, "center"), [1.0, 1.5, 3.0, 6.0])
        # periodic wraps instead
        np.testing.assert_allclose(
            interp_cgrid(f, 0, "left", periodic=True), [1.5, 3.0, 6.0, 4.5])
        np.testing.assert_allclose(
            interp_cgrid(f, 0, "center", periodic=True), [4.5, 1.5, 3.0, 6.0])
        # fill uses zero ghosts
        np.testing.assert_allclose(
            interp_cgrid(f, 0, "left", bc="fill"), [1.5, 3.0, 6.0, 4.0])


class TestMITgcmCompletion:
    def _cgrid(self, ny=6, nx=8, nz=3):
        """Synthetic C-grid with distinct ramps per field so any axis or
        direction mix-up changes the answer."""
        rng = np.random.default_rng(7)
        ds = {
            "XC": np.arange(nx) + 0.5, "YC": np.arange(ny) + 0.5,
            "Z": -(np.arange(nz) + 0.5),
            "dxC": 100.0 + 10.0 * np.arange(nx)[None, :]
                   + np.arange(ny)[:, None],              # (YC, XG)
            "dyC": 200.0 + 20.0 * np.arange(ny)[:, None]
                   + np.arange(nx)[None, :],              # (YG, XC)
            "dxG": 300.0 + 30.0 * np.arange(nx)[None, :]
                   + np.arange(ny)[:, None],              # (YG, XC)
            "dyG": 400.0 + 40.0 * np.arange(ny)[:, None]
                   + np.arange(nx)[None, :],              # (YC, XG)
            "drF": np.array([1.0, 2.0, 4.0]),
            "hFacC": rng.uniform(0.2, 1.0, (nz, ny, nx)),
            "hFacW": rng.uniform(0.2, 1.0, (nz, ny, nx)),
            "hFacS": rng.uniform(0.2, 1.0, (nz, ny, nx)),
            "rA": np.ones((ny, nx)),
        }
        return ds

    def test_interp_derivations_periodic_x(self):
        ds = self._cgrid()
        m = complete_mitgcm_metrics(ds, periodic="X")
        dxC, dyC, dxG, dyG = ds["dxC"], ds["dyC"], ds["dxG"], ds["dyG"]
        # dxF = interp(dxC, 'X'): XG -> XC, wrap (utils.py:453-454)
        np.testing.assert_allclose(
            m["dxF"], 0.5 * (dxC + np.roll(dxC, -1, axis=1)), rtol=1e-12)
        # dxV = interp(dxG, 'X'): XC -> XG, wrap (utils.py:457-458)
        np.testing.assert_allclose(
            m["dxV"], 0.5 * (dxG + np.roll(dxG, 1, axis=1)), rtol=1e-12)
        # dyF = interp(dyC, 'Y'): YG -> YC, wall extended (utils.py:455-456)
        want = 0.5 * (dyC + np.roll(dyC, -1, axis=0))
        want[-1] = dyC[-1]
        np.testing.assert_allclose(m["dyF"], want, rtol=1e-12)
        # dyU = interp(dyG, 'Y'): YC -> YG, wall extended (utils.py:459-460)
        want = 0.5 * (dyG + np.roll(dyG, 1, axis=0))
        want[0] = dyG[0]
        np.testing.assert_allclose(m["dyU"], want, rtol=1e-12)

    def test_hfacz_and_partial_cells(self):
        ds = self._cgrid()
        m = complete_mitgcm_metrics(ds, periodic="X")
        hS = ds["hFacS"]
        # hFacZ = interp(hFacS, 'X'): XC -> XG (utils.py:462-463)
        np.testing.assert_allclose(
            m["hFacZ"], 0.5 * (hS + np.roll(hS, 1, axis=2)), rtol=1e-12)
        np.testing.assert_allclose(m["maskZ"], m["hFacZ"], rtol=0)
        # drW/drS/drC = hFac * drF (utils.py:444-449)
        drF = ds["drF"][:, None, None]
        np.testing.assert_allclose(m["drW"], ds["hFacW"] * drF, rtol=1e-12)
        np.testing.assert_allclose(m["drS"], ds["hFacS"] * drF, rtol=1e-12)
        np.testing.assert_allclose(m["drC"], ds["hFacC"] * drF, rtol=1e-12)
        # yA = drF * hFacC * dxF (utils.py:467-469)
        np.testing.assert_allclose(m["yA"], drF * ds["hFacC"] * m["dxF"],
                                   rtol=1e-12)

    def test_partial_cell_off(self):
        ds = self._cgrid()
        m = complete_mitgcm_metrics(ds, periodic="X", partial_cell=False)
        drF = ds["drF"][:, None, None]
        np.testing.assert_allclose(
            m["drC"], np.broadcast_to(drF, ds["hFacC"].shape), rtol=1e-12)
        np.testing.assert_allclose(m["yA"], drF * m["dxF"], rtol=1e-12)

    def test_existing_fields_not_overwritten(self):
        ds = self._cgrid()
        ds["dxF"] = np.full((6, 8), 123.0)
        m = complete_mitgcm_metrics(ds, periodic="X")
        assert "dxF" not in m  # only *missing* metrics are added

    def test_facade_horizontal_grid(self):
        """The facade builds a horizontal (YC, XC) grid for ocean-Keff style
        datasets (reference tests/test_Keff_ocean.py layout)."""
        from xcontour_tpu.xcontour import add_MITgcm_missing_metrics
        ds = self._cgrid()
        del ds["Z"]
        ds["hFacC"] = ds["hFacC"][0]
        ds["hFacW"] = ds["hFacW"][0]
        ds["hFacS"] = ds["hFacS"][0]
        del ds["drF"]
        metrics, grid = add_MITgcm_missing_metrics(ds, dtype=jnp.float64)
        assert grid.dim_names == ("YC", "XC")
        assert grid.shape == (6, 8)
        assert "dxF" in metrics and "hFacZ" in metrics
        np.testing.assert_allclose(np.asarray(grid.dxF), metrics["dxF"],
                                   rtol=1e-6)

    def test_facade_vertical_plane_unchanged(self):
        """The LAPE-style (Z, XC) path still produces the partial-cell yA
        plane grid."""
        from xcontour_tpu.xcontour import add_MITgcm_missing_metrics
        from xcontour_tpu.utils import synth
        v, dims = synth.synth_internalwave(nt=1, nz=12, nx=32)
        metrics, grid = add_MITgcm_missing_metrics(v, dtype=jnp.float64)
        np.testing.assert_allclose(metrics["yA"], v["yA"], rtol=1e-6)
        assert grid.dim_names == ("Z", "XC")


class TestMITgcmFacadeFallbacks:
    """The facade's fallback ladder (reference utils.py:418-488): minimal
    datasets still produce a working plane grid, missing requirements fail
    loudly."""

    def test_missing_plane_coords_raises(self):
        from xcontour_tpu.xcontour import add_MITgcm_missing_metrics
        with pytest.raises(ValueError, match="Z\\+XC or YC\\+XC"):
            add_MITgcm_missing_metrics({"XC": np.arange(4) + 0.5})

    def test_horizontal_missing_rA_raises(self):
        from xcontour_tpu.xcontour import add_MITgcm_missing_metrics
        ds = {"YC": np.arange(6) + 0.5, "XC": np.arange(8) + 0.5}
        with pytest.raises(ValueError, match="rA"):
            add_MITgcm_missing_metrics(ds)

    def test_horizontal_3d_maskC_takes_surface_level(self):
        from xcontour_tpu.xcontour import add_MITgcm_missing_metrics
        ny, nx = 6, 8
        maskC = np.ones((3, ny, nx))
        maskC[0, 2, 3] = 0.0        # surface hole
        maskC[1] = 0.0              # deeper levels must be ignored
        ds = {"YC": np.arange(ny) + 0.5, "XC": np.arange(nx) + 0.5,
              "rA": np.full((ny, nx), 4.0),
              "dxF": np.full((ny, nx), 2.0), "dyF": np.full((ny, nx), 2.0),
              "maskC": maskC}
        metrics, grid = add_MITgcm_missing_metrics(ds, dtype=jnp.float64)
        m = np.asarray(grid.mask)
        assert m[2, 3] == 0.0 and m.sum() == ny * nx - 1

    def test_vertical_minimal_dset_fallbacks(self):
        """Z+XC with only drF and a 1-D dxC: dxF falls back to dxC,
        broadcasts over Z, hFacC defaults to full cells, drC and yA are
        derived."""
        from xcontour_tpu.xcontour import add_MITgcm_missing_metrics
        nz, nx = 5, 12
        ds = {"Z": -(np.arange(nz) + 0.5), "XC": np.arange(nx) + 0.5,
              "drF": np.full(nz, 2.0), "dxC": np.full(nx, 3.0)}
        metrics, grid = add_MITgcm_missing_metrics(ds, periodic=None,
                                                   dtype=jnp.float64)
        assert grid.dim_names == ("Z", "XC") and grid.shape == (nz, nx)
        np.testing.assert_allclose(metrics["yA"], np.full((nz, nx), 6.0))
        np.testing.assert_allclose(np.asarray(grid.dA),
                                   np.full((nz, nx), 6.0))
        np.testing.assert_allclose(metrics["drC"], np.full((nz, nx), 2.0))

    def test_vertical_maskC_as_hfac(self):
        """hFacC absent but maskC present: the mask stands in for the
        partial-cell fraction (binary cells)."""
        from xcontour_tpu.xcontour import add_MITgcm_missing_metrics
        nz, nx = 4, 10
        maskC = np.ones((nz, nx))
        maskC[2:, :3] = 0.0
        ds = {"Z": -(np.arange(nz) + 0.5), "XC": np.arange(nx) + 0.5,
              "drF": np.full(nz, 1.5), "dxF": np.full((nz, nx), 2.0),
              "maskC": maskC}
        metrics, grid = add_MITgcm_missing_metrics(ds, dtype=jnp.float64)
        np.testing.assert_allclose(metrics["yA"], 3.0 * maskC)
        np.testing.assert_allclose(np.asarray(grid.mask), maskC)
