"""Example 3 — Local available potential energy via vertical sorting.

Mirrors reference notebooks/3.LAPE_ocean.ipynb / tests/test_LAPE.py: buoyancy
from a linear EOS on an MITgcm-style x-z internal-wave snapshot (synthesized;
the upstream blob is missing), adiabatic sorting along depth with
increase=False, lt=False, and the positive-definite local APE density.

Run:  python examples/ex3_lape_ocean.py   (writes ex3_lape_ocean.png)
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from _pins import _pin  # shared golden-pin helper (examples/_pins.py)

import numpy as np
import jax.numpy as jnp

from xcontour_tpu.utils import synth
from xcontour_tpu.xcontour import add_MITgcm_missing_metrics
from xcontour_tpu.pipeline import lwa_pipeline


def main():
    v, _ = synth.synth_internalwave(nt=3, nz=100, nx=448)
    metrics, grid = add_MITgcm_missing_metrics(v)

    T = np.where(v["maskC"][None] > 0, v["THETA"], np.nan)
    alpha, T0, g0 = 2e-4, 20.0, 9.81
    b = (alpha * (T - T0) * g0).astype(np.float32)

    out = lwa_pipeline(jnp.asarray(b), grid, jnp.asarray(v["maskC"]),
                       N=121, increase=False, lt=False)
    lape = -np.asarray(out["lwa"])     # positive-definite density

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(3, 1, figsize=(9, 8), sharex=True)
    for t in range(3):
        m = axes[t].contourf(v["XC"], v["Z"], lape[t] * 1e4,
                             levels=np.linspace(0, 50, 26), cmap="Reds",
                             extend="max")
        axes[t].contour(v["XC"], v["Z"], np.where(np.isnan(b[t]), 0, b[t]),
                        levels=11, colors="k", linewidths=0.4)
        axes[t].set_title(f"buoyancy and local APE density (t={t})")
    fig.colorbar(m, ax=axes, shrink=0.8)
    fig.savefig(os.path.join(os.path.dirname(__file__), "ex3_lape_ocean.png"),
                dpi=110)
    # positive-definite up to the documented f32 noise floor of the default
    # LWA path (~5e-5 of the field max; see pipeline.lwa_pipeline docstring)
    floor = 5e-5 * np.nanmax(lape)
    ok = bool(np.nanmin(lape) > -floor)
    print("LAPE >= 0 everywhere (to the f32 noise floor):", ok,
          f"(min {np.nanmin(lape):.2e}, floor {-floor:.2e})")
    assert ok, "LAPE must be positive-definite to the documented floor"
    # golden pins (deterministic synth fixture): per-snapshot totals grow
    # with the wave amplitude; the absolute scale is pinned
    _pin("lape_total_t2", float(np.nansum(lape[2])), 9937.53, rtol=2e-3)
    _pin("lape_max_t2", float(np.nanmax(lape[2])), 1.386638, rtol=2e-3)



if __name__ == "__main__":
    main()
