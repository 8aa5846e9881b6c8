"""Reference-compatible namespace.

The reference's tests and notebooks import everything from
``xcontour.xcontour`` (e.g. /root/reference/tests/test_Keff_atmos.py:12); this
module provides the same symbols under the same names so a user of the
reference can switch imports and find everything:

    from xcontour_tpu.xcontour import (
        Contour2D, Table, add_latlon_metrics, add_MITgcm_missing_metrics,
        latitude_lengths_at, equivalent_latitudes,
        contour_length, find_contour, contour_area)

``add_latlon_metrics`` / ``add_MITgcm_missing_metrics`` operate on the plain
dict-of-arrays datasets produced by ``utils.ncio.load_dataset`` (this
framework has no xarray dependency) and return ``(metrics_dict, Grid)``.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import jax.numpy as jnp

from .core import Contour2D, Table  # noqa: F401
from .grid import (Grid, from_latlon, from_metrics, latitude_lengths_at,  # noqa: F401
                   equivalent_latitudes, _edges_from_centers)
from .host.extract import find_contour, contour_length, contour_area  # noqa: F401
from .utils.constants import Rearth as _REARTH

# reference dim-name autodetect lists (utils.py:34-39)
dimXList = ["lon", "longitude", "LON", "LONGITUDE", "geolon", "GEOLON",
            "xt_ocean", "XC"]
dimYList = ["lat", "latitude", "LAT", "LATITUDE", "geolat", "GEOLAT",
            "yt_ocean", "YC"]
dimZList = ["lev", "level", "LEV", "LEVEL", "pressure", "PRESSURE",
            "depth", "DEPTH", "Z"]


def _detect(ds, dims: Optional[dict]):
    names = set(ds.keys()) if hasattr(ds, "keys") else set(ds)
    if dims is not None:
        return dims.get("X"), dims.get("Y"), dims.get("Z")
    lon = next((d for d in dimXList if d in names), None)
    lat = next((d for d in dimYList if d in names), None)
    lev = next((d for d in dimZList if d in names), None)
    if lon is None or lat is None:
        raise ValueError("unknown dimension names; expected one of "
                         f"{dimXList + dimYList}")
    return lon, lat, lev


def add_latlon_metrics(dset, dims: Optional[dict] = None,
                       boundary: Optional[dict] = None,
                       Rearth: float = _REARTH,
                       dtype=jnp.float32) -> Tuple[dict, Grid]:
    """Infer spherical metrics from 1-D lat/lon coordinates (semantics of
    reference utils.py:43-259): exact cell areas with pole clamping, staggered
    x/y line elements, X-periodicity sniffing.

    Returns (metrics, grid): ``metrics`` maps the reference's names (rA, dxF,
    dyF, dxG, dyG, ...) to numpy arrays; ``grid`` is the :class:`Grid` the
    analysis classes consume.  ``boundary`` is accepted for signature
    compatibility (boundary handling lives in the stencil module here).
    """
    del boundary
    lon_n, lat_n, lev_n = _detect(dset, dims)
    lat = np.asarray(dset[lat_n], np.float64)
    lon = np.asarray(dset[lon_n], np.float64)
    grid = from_latlon(lat, lon, Rearth=Rearth, dim_names=(lat_n, lon_n),
                       dtype=dtype)

    latE = _edges_from_centers(lat)
    lonE = _edges_from_centers(lon)
    d2r = np.pi / 180.0
    latEc = np.clip(latE, -90.0, 90.0)
    dlam = np.diff(lonE)                      # cell widths (deg)
    dlamC = np.diff(lonE)                     # uniform-lon assumption matches
    dphiE = np.diff(latE)                     # cell heights (deg)

    def zonal(lats_deg, dl):
        dx = np.abs(np.cos(np.clip(lats_deg, -90, 90) * d2r)[:, None]
                    * dl[None, :] * d2r * Rearth)
        return np.where(dx < 1e-15, 0.0, dx)

    # staggered line elements (reference utils.py:166-171): G = cell edges,
    # F = cell centers, C = between centers, V/U = the remaining corners
    dxG = zonal(latE, dlam)                   # (Ny+1, Nx) at lat edges
    dxF = 0.5 * (dxG[:-1] + dxG[1:])
    dxC = zonal(lat, dlamC)                   # at centers, center spacing
    dxV = dxG[:-1, :]
    dyG = np.broadcast_to((dphiE * d2r * Rearth)[:, None], grid.shape).copy()
    dyC = np.broadcast_to((np.gradient(lat) * d2r * Rearth)[:, None],
                          grid.shape).copy()

    # spherical face areas (reference utils.py:179-208): rA at centers, and
    # the staggered variants built from the same band geometry
    sin_band = np.abs(np.diff(np.sin(latEc * d2r)))          # (Ny,)
    rA = (Rearth ** 2) * sin_band[:, None] * (dlam * d2r)[None, :]
    rAw = (Rearth ** 2) * sin_band[:, None] * (dlamC * d2r)[None, :]
    latCc = np.clip(lat, -90, 90)
    band_s = np.abs(np.sin(latCc * d2r) - np.sin(
        np.clip(latCc - np.gradient(lat), -90, 90) * d2r))
    rAs = (Rearth ** 2) * band_s[:, None] * (dlam * d2r)[None, :]
    rAz = (Rearth ** 2) * band_s[:, None] * (dlamC * d2r)[None, :]

    metrics = {
        "rA": rA, "rAw": rAw, "rAs": rAs, "rAz": rAz,
        "dxG": dxG[:-1, :], "dxF": dxF, "dxC": dxC, "dxV": dxV,
        "dyG": dyG, "dyF": np.asarray(grid.dyF), "dyC": dyC, "dyU": dyC,
    }

    # vertical metrics when a level dimension is present (utils.py:210-221)
    if lev_n is not None and lev_n in dset:
        levC = np.asarray(dset[lev_n], np.float64)
        tmp = np.diff(levC)
        tmp = np.concatenate([[levC[0] - tmp[0]], levC])
        delz = np.diff(tmp)
        metrics["drF"] = delz
        metrics["drG"] = np.concatenate([[delz[0] / 2], delz[1:-1],
                                         [delz[-1] / 2]])
    return metrics, grid


def add_latlon_metrics_old(dset, dims: Optional[dict] = None,
                           boundary: Optional[dict] = None,
                           dtype=jnp.float32) -> Tuple[dict, Grid]:
    """Legacy rectangle-area metrics rA = dyF * dxF (reference
    utils.py:261-415)."""
    lon_n, lat_n, _ = _detect(dset, dims)
    lat = np.asarray(dset[lat_n], np.float64)
    lon = np.asarray(dset[lon_n], np.float64)
    grid = from_latlon(lat, lon, dim_names=(lat_n, lon_n), dtype=dtype,
                       exact_area=False)
    metrics = {"rA": np.asarray(grid.dA), "dxF": np.asarray(grid.dxF),
               "dyF": np.asarray(grid.dyF)}
    return metrics, grid


def add_MITgcm_missing_metrics(dset, periodic=None, boundary=None,
                               partial_cell: bool = True,
                               dtype=jnp.float32) -> Tuple[dict, Grid]:
    """Complete missing MITgcm metrics (semantics of reference
    utils.py:418-488): vertical partial-cell thicknesses drW/drS/drC from
    hFac, and the X-Z plane area yA = drF * hFacC * dxF.

    ``dset`` must carry Z, XC, drF, dxF (or dxC/dxG) and optionally hFacC /
    hFacW / hFacS.  Returns (metrics, grid) with the grid on the (Z, XC)
    plane for vertical-plane analyses (LAPE).
    """
    del periodic, boundary
    get = lambda k: np.asarray(dset[k], np.float64) if k in dset else None
    z = get("Z")
    xc = get("XC")
    drF = get("drF")
    dxF = get("dxF")
    if dxF is None:
        dxF = get("dxC") if "dxC" in dset else get("dxG")
    if dxF is not None and dxF.ndim == 1:
        dxF = np.broadcast_to(dxF[None, :], (z.size, xc.size))
    hFacC = get("hFacC")
    if hFacC is None:
        hFacC = get("maskC")
    if hFacC is None:
        hFacC = np.ones((z.size, xc.size))
    hf = hFacC if partial_cell else np.ones_like(hFacC)

    metrics = {"drC": hf * drF[:, None] if drF.ndim == 1 else hf * drF,
               "yA": (drF[:, None] if drF.ndim == 1 else drF) * hf * dxF}
    for name, key in (("drW", "hFacW"), ("drS", "hFacS")):
        h = get(key)
        if h is not None:
            metrics[name] = (h * drF[:, None]) if drF.ndim == 1 else h * drF
    if "yA" in dset:
        metrics["yA"] = get("yA")

    grid = from_metrics(z, xc, metrics["yA"], dxF=dxF,
                        mask=(hFacC > 0).astype(np.float64),
                        dim_names=("Z", "XC"), latlon=False, periodic_x=True,
                        dtype=dtype)
    return metrics, grid
