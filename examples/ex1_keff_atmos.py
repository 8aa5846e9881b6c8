"""Example 1 — Effective diffusivity on isentropic PV (Nakamura 1996).

Mirrors reference notebooks/1.Keff_atmos.ipynb: per-level contours on a
(level, lat, lon) PV stack, equivalent-latitude coordinates, Leq^2 and
normalized Keff.  Uses the synthesized PV fixture (the reference's PV.nc blob
is missing upstream) and the batched hist path with per-level bins — the 3-D
case the reference had to route through its memory-hungry broadcast path.

Run:  python examples/ex1_keff_atmos.py   (writes ex1_keff_atmos.png)
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from _pins import _pin  # shared golden-pin helper (examples/_pins.py)

import numpy as np
import jax.numpy as jnp

from xcontour_tpu import grid as G
from xcontour_tpu.utils import synth
from xcontour_tpu.pipeline import keff_pipeline


def main():
    v, _ = synth.synth_pv(nlev=6, nlat=121, nlon=240)
    grid = G.from_latlon(v["latitude"], v["longitude"])
    pre_y = np.linspace(-90, 90, 181).astype(np.float32)

    out = keff_pipeline(jnp.asarray(v["pv"]), grid, jnp.asarray(v["grdSpv"]),
                        None, jnp.asarray(pre_y), N=121, increase=True,
                        lt=True, hist=True, lmin="analytic")
    nkeff = np.asarray(out["interp"]["nkeff"])   # (level, 181)

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, 2, figsize=(11, 4.5))
    axes[0].contourf(v["longitude"], v["latitude"], v["pv"][3], levels=31,
                     cmap="RdBu_r")
    axes[0].set_title("isentropic PV (level 3)")
    m = axes[1].contourf(pre_y, v["level"], np.log10(np.maximum(nkeff, 1e-2)),
                         levels=21, cmap="viridis")
    axes[1].set_title(r"$\log_{10}$ normalized $K_{eff}$ (per level)")
    axes[1].set_xlabel("equivalent latitude")
    axes[1].set_ylabel("isentropic level (K)")
    fig.colorbar(m, ax=axes[1])
    fig.tight_layout()
    fig.savefig(os.path.join(os.path.dirname(__file__), "ex1_keff_atmos.png"),
                dpi=110)
    frac = np.isfinite(nkeff).mean()
    print("Keff finite fraction:", frac)
    assert frac > 0.5, "most per-level Keff values should be finite"
    # golden pins: tolerance-banded values recorded from the committed
    # fixture (deterministic synth seed) — a silent scale/sign regression
    # fails here even though the plot would still render
    _pin("nkeff_median", float(np.nanmedian(nkeff)), 2.935429, rtol=2e-3)
    _pin("nkeff_max", float(np.nanmax(nkeff)), 13.66258, rtol=2e-3)



if __name__ == "__main__":
    main()
