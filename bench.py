#!/usr/bin/env python
"""Headline benchmark: combined Keff + LWA diagnostics, snapshots/sec.

Workload (BASELINE.json north star): the full effective-diffusivity +
local-wave-activity chain on 256x512 global vorticity snapshots, N=121
contours — the configuration of the bundled Data/barotropic_vorticity.nc and
reference tests/test_LWA.py:26.

Baseline: the float64 NumPy reference-semantics implementation (compat.py)
timed on the same machine.  The reference's actual stack (xarray + dask +
xhistogram) adds interpreter/graph overhead on top of the same NumPy kernels,
so the reported speedup is a conservative lower bound on the speedup over the
real reference.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "snapshots/sec", "vs_baseline": N}
"""

import json
import os
import sys
import time

# persistent compilation cache: the remote Mosaic compile service in this
# image is slow cold, instant cached
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import numpy as np


def _load():
    from xcontour_tpu.utils.ncio import load_dataset
    ds = load_dataset("/root/reference/Data/barotropic_vorticity.nc")
    return (np.asarray(ds["latitude"], np.float64),
            np.asarray(ds["longitude"], np.float64),
            np.asarray(ds["absolute_vorticity"], np.float64))


def cpu_baseline_sps(lat, lon, vor, n_snap=2, N=121):
    """Reference-semantics CPU chain, per-snapshot Python loop (the
    reference's execution model), seconds -> snapshots/sec."""
    from xcontour_tpu import compat
    from xcontour_tpu import grid as G
    import jax.numpy as jnp

    # f32 metrics are fine here: this function only anchors the *timing*
    # baseline (the math runs in numpy float64 regardless)
    grid = G.from_latlon(lat, lon, dtype=jnp.float32)
    dA = np.asarray(grid.dA)
    dxF = np.asarray(grid.dxF)
    mask = np.ones_like(vor)
    pre_y = lat

    t0 = time.perf_counter()
    for i in range(n_snap):
        tr = vor if i == 0 else vor * (1.0 + 1e-6 * i)
        grdS = compat.squared_gradient(tr, lat, lon)
        out = compat.keff_snapshot(tr, grdS, lat, dA, dxF, mask, pre_y, N=N,
                                   increase=True, lt=True, hist=True,
                                   lmin="analytic")
        Q = compat.interp_to_coords(lat, out["origin"]["Yeq"],
                                    out["origin"]["contour"])
        compat.local_wave_activity(tr, Q, dA, lat, increase=True)
    dt = time.perf_counter() - t0
    return n_snap / dt


def tpu_sps(lat, lon, vor, batch=32, reps=8, N=121):
    import jax
    import jax.numpy as jnp
    from xcontour_tpu import grid as G
    from xcontour_tpu.pipeline import keff_lwa_pipeline

    grid = G.from_latlon(lat, lon, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    snaps = (vor[None, :, :] *
             (1.0 + 1e-4 * rng.standard_normal((batch, 1, 1))))
    tr = jnp.asarray(snaps, jnp.float32)

    def step(t):
        out = keff_lwa_pipeline(t, grid, N=N, increase=True, lt=True,
                                lmin="analytic")
        return out["nkeff"], out["Yeq"], out["lwa"]

    fn = jax.jit(step)
    out = fn(tr)
    jax.block_until_ready(out)  # compile + warm
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(tr)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    return batch * reps / dt, out


def main():
    lat, lon, vor = _load()
    batch = int(os.environ.get("BENCH_BATCH", "32"))
    reps = int(os.environ.get("BENCH_REPS", "8"))
    n_cpu = int(os.environ.get("BENCH_CPU_SNAPS", "2"))

    dev_sps, out = tpu_sps(lat, lon, vor, batch=batch, reps=reps)
    cpu_sps = cpu_baseline_sps(lat, lon, vor, n_snap=n_cpu)

    # sanity: results finite where expected
    nk = np.asarray(out[0])
    assert np.isfinite(nk).sum() > nk.size * 0.5, "benchmark output degenerate"

    print(json.dumps({
        "metric": "keff+lwa snapshots/sec (256x512 global grid, N=121, f32)",
        "value": round(dev_sps, 3),
        "unit": "snapshots/sec",
        "vs_baseline": round(dev_sps / cpu_sps, 2),
    }))


if __name__ == "__main__":
    sys.exit(main())
