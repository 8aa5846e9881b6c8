#!/usr/bin/env python
"""Extended TPU benchmarks beyond the headline bench.py metric.

1. ERA5-scale grid (721 x 1440, 0.25 deg): single-snapshot-batch throughput of
   the combined Keff+LWA chain — exercises the X-panel-blocked LWA kernel.
2. Year-of-daily-PV streaming (the BASELINE.json north-star config): 365
   snapshots through runner.run_batched, end-to-end wall clock including
   host->device transfer overlap.

Run from the repo root with the TPU environment:
    python tools/tpu_bench_extra.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import numpy as np
import jax
import jax.numpy as jnp


def era5_scale():
    from xcontour_tpu import grid as G
    from xcontour_tpu.pipeline import keff_lwa_pipeline

    Ny, Nx = 721, 1440
    lat = np.linspace(-90, 90, Ny)
    lon = np.arange(0, 360, 0.25)
    grid = G.from_latlon(lat, lon, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    phi = np.deg2rad(lat)[:, None]
    base = 2e-4 * np.sin(phi) + 4e-5 * np.cos(phi) ** 2 * np.sin(
        5 * np.deg2rad(lon)[None, :])
    B = 8
    tr = jnp.asarray(base[None] * (1 + 1e-3 * rng.standard_normal((B, 1, 1)))
                     + 2e-6 * rng.standard_normal((B, Ny, Nx)), jnp.float32)

    fn = jax.jit(lambda t: keff_lwa_pipeline(t, grid, N=241, increase=True,
                                             lt=True, lmin="analytic")["lwa"])
    t0 = time.perf_counter()
    jax.block_until_ready(fn(tr))
    print(f"era5-scale compile+first: {time.perf_counter() - t0:.1f}s",
          flush=True)
    t0 = time.perf_counter()
    for _ in range(5):
        o = fn(tr)
    jax.block_until_ready(o)
    sps = 5 * B / (time.perf_counter() - t0)
    print(f"era5-scale (721x1440, N=241): {sps:.1f} snapshots/sec", flush=True)


def year_of_pv():
    from xcontour_tpu import grid as G
    from xcontour_tpu.pipeline import keff_lwa_pipeline
    from xcontour_tpu.runner import run_batched
    from xcontour_tpu.utils.ncio import load_dataset

    ds = load_dataset("/root/reference/Data/barotropic_vorticity.nc")
    lat = np.asarray(ds["latitude"])
    lon = np.asarray(ds["longitude"])
    vor = np.asarray(ds["absolute_vorticity"], np.float32)
    grid = G.from_latlon(lat, lon, dtype=jnp.float32)

    rng = np.random.default_rng(1)
    year = (vor[None] * (1 + 1e-3 * rng.standard_normal((365, 1, 1)))
            ).astype(np.float32)

    def step(t):
        out = keff_lwa_pipeline(t, grid, N=121, increase=True, lt=True,
                                lmin="analytic")
        return {"nkeff": out["nkeff"], "Yeq": out["Yeq"], "lwa": out["lwa"]}

    jstep = jax.jit(step)
    # warm the compile outside the timed run
    jax.block_until_ready(jstep(jnp.asarray(year[:32])))
    t0 = time.perf_counter()
    out = run_batched(jstep, year, batch=32, log=lambda s: None)
    dt = time.perf_counter() - t0
    print(f"year-of-PV: 365 snapshots end-to-end in {dt:.2f}s "
          f"({365 / dt:.0f} snapshots/sec incl. host IO); "
          f"outputs {[(k, v.shape) for k, v in out.items()]}", flush=True)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    era5_scale()
    year_of_pv()
