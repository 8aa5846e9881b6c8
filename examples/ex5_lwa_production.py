"""Example 5 — Production LWA loop with sigma weighting and resume.

Mirrors reference tests/LWA.py: the areal/isentropic LWA variant over a
time x level archive, normalized by the earth-circle perimeter, written in
resumable chunks.  Where the reference loops Python over every (time, level)
snapshot rebuilding xarray objects, here the level batch is one jitted
program and the time axis streams through runner.run_batched with overlapped
transfers and idempotent per-chunk outputs.

Run:  python examples/ex5_lwa_production.py
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from _pins import _pin  # shared golden-pin helper (examples/_pins.py)

import numpy as np
import jax
import jax.numpy as jnp

from xcontour_tpu import grid as G
from xcontour_tpu.utils import synth
from xcontour_tpu.pipeline import lwa_pipeline, as_dataset
from xcontour_tpu.runner import run_batched, load_chunks
from xcontour_tpu.utils.constants import Rearth


def main():
    # synthetic ERA-like archive: 8 "days" of the PV fixture with evolution
    v, _ = synth.synth_pv(nlev=3, nlat=91, nlon=144)
    rng = np.random.default_rng(0)
    days = 8
    pv = np.stack([v["pv"][1] * (1 + 0.05 * np.sin(t / 2.0))
                   + 2e-6 * rng.standard_normal(v["pv"][1].shape)
                   for t in range(days)]).astype(np.float32)
    # isentropic-density weighting (reference tests/LWA.py:59-69): the sorted
    # tracer is the COMPOSITION sigma*q with a NON-UNIT sigma ~ -dp/dtheta/g
    # (density-like: heavier at low latitudes, kg m^-2 K^-1 scale); the area
    # integral keeps integrand 1 (lwa_pipeline's intArea already integrates
    # plain dA).  Parity with the f64 oracle is pinned in
    # tests/test_sigma_production.py.
    lat = v["latitude"]
    sigma = (120.0 * (1.0 + 0.5 * np.cos(np.deg2rad(lat)) ** 2)
             ).astype(np.float32)[:, None]                 # (lat, 1)
    grid = G.from_latlon(lat, v["longitude"])
    perim = 2 * np.pi * Rearth * np.cos(np.deg2rad(lat))

    def step(batch):
        out = lwa_pipeline(batch * sigma, grid, N=91, increase=True, lt=True,
                           metric="dy")
        # reference normalization: lwa / earth_circle_perimeter
        # (tests/LWA.py:22,80)
        lwa_norm = out["lwa"] / jnp.asarray(perim, jnp.float32)[:, None]
        return {"lwa": out["lwa"], "lwa_norm": lwa_norm, "Q": out["Q"]}

    stem = os.path.join(tempfile.gettempdir(), "lwa_prod")
    run_batched(jax.jit(step), pv, batch=4, out_stem=stem)
    out = load_chunks(stem)
    print("archive LWA shape:", out["lwa"].shape,
          "max (m/s):", float(np.nanmax(out["lwa"])))
    # resume is a no-op
    run_batched(jax.jit(step), pv, batch=4, out_stem=stem)

    # labeled netCDF-3 output, like the reference's to_netcdf
    # (tests/LWA.py:99-101) but with coordinates attached by as_dataset
    ds = as_dataset(out, grid)
    nc = os.path.join(tempfile.gettempdir(), "lwa_prod.nc")
    ds.to_nc3(nc)
    print("wrote", nc, "vars:", sorted(ds.keys()),
          "dims(lwa):", ds.dims_of("lwa"))
    assert out["lwa"].shape == pv.shape and np.nanmax(out["lwa"]) > 0
    assert {"Q", "lwa", "lwa_norm"} <= set(ds.keys())
    # golden pins (deterministic synth fixture + rng seed)
    _pin("lwa_max", float(np.nanmax(out["lwa"])), 121836.2, rtol=2e-3)
    _pin("lwa_norm_mean_abs", float(np.nanmean(np.abs(out["lwa_norm"]))),
         0.2293725, rtol=2e-3)



if __name__ == "__main__":
    main()
