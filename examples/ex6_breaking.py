"""Example 6 — Rossby-wave-breaking contour detection.

Mirrors reference tests/test_breaking.py: extract a PV contour with the
native marching-squares traversal, snap it to the grid, stitch pieces across
the periodic longitude border, and select the circumpolar contour whose
meanders mark wave breaking.

Run:  python examples/ex6_breaking.py   (writes ex6_breaking.png)
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from _pins import _pin  # shared golden-pin helper (examples/_pins.py)

import numpy as np

from xcontour_tpu.utils import synth
from xcontour_tpu.host import breaking


def main():
    v, _ = synth.synth_pv(nlev=3, nlat=181, nlon=360, seed=11)
    pv = np.asarray(v["pv"][2], np.float64)
    lat = np.asarray(v["latitude"])
    lon = np.asarray(v["longitude"])
    level = 0.7 * np.nanmax(pv)

    pieces = breaking.extract_contours(pv, lat, lon, level)
    snapped = breaking.rescale_contours(pieces, lat, lon)
    snapped = [c for c in snapped if len(c) >= 2]
    grouped = breaking.group_contours(snapped, y_overlap=2.0,
                                      lon_border=(lon.min(), lon.max()))
    main_contour = breaking.single_contour(grouped, lon, x_extent=0.8)

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(11, 5))
    m = ax.contourf(lon, lat, pv, levels=31, cmap="RdBu_r")
    for c in pieces:
        ax.plot(c[:, 0], c[:, 1], color="gray", lw=0.6)
    ax.plot(main_contour[:, 0], main_contour[:, 1], "k.", ms=2,
            label="circumpolar contour (snapped)")
    ax.set_title(f"wave-breaking contour at level {level:.2e} "
                 f"({len(pieces)} raw pieces -> {len(grouped)} groups)")
    ax.legend(loc="lower left")
    fig.colorbar(m, ax=ax)
    fig.tight_layout()
    fig.savefig(os.path.join(os.path.dirname(__file__), "ex6_breaking.png"),
                dpi=110)
    cover = len(np.unique(np.round(main_contour[:, 0]))) / lon.size
    print(f"selected contour: {len(main_contour)} pts, "
          f"{cover:.0%} longitude coverage")
    assert cover >= 0.99, "the circumpolar contour must span the globe"
    # golden pins: the host extraction chain is float64 and deterministic
    _pin("main_contour_pts", float(len(main_contour)), 421.0, rtol=2e-2)
    _pin("main_contour_mean_lat", float(main_contour[:, 1].mean()),
         44.24466, rtol=5e-3)
    _pin("raw_pieces", float(len(pieces)), 1.0, rtol=0.3)



if __name__ == "__main__":
    main()
