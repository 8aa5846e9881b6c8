#!/usr/bin/env python
"""On-TPU validation: numerics + throughput of the real hardware path.

Run from the repo root with the inherited environment (JAX_PLATFORMS=axon):
    python tools/tpu_smoke.py

Checks the Pallas fast path against the float64 NumPy oracle on the bundled
snapshot and prints a short report.  This complements tests/ (which run on a
virtual CPU mesh) by covering the Mosaic-lowered kernels on real silicon.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
# Mosaic compiles go through a slow remote service in this image; a persistent
# cache makes reruns (and the driver's bench) start in seconds
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from xcontour_tpu.utils.ncio import load_dataset
    from xcontour_tpu import grid as G, compat
    from xcontour_tpu.pipeline import keff_lwa_pipeline

    print("devices:", jax.devices())
    assert jax.default_backend() == "tpu", "run with the TPU environment"

    ds = load_dataset("/root/reference/Data/barotropic_vorticity.nc")
    lat = np.asarray(ds["latitude"], np.float64)
    lon = np.asarray(ds["longitude"], np.float64)
    vor = np.asarray(ds["absolute_vorticity"], np.float64)
    grid = G.from_latlon(lat, lon, dtype=jnp.float32)

    # keep the batched (B, Ny, Nx) kernel shapes the bench also uses so the
    # compilation cache is shared
    out = keff_lwa_pipeline(jnp.asarray(vor, jnp.float32)[None], grid, N=121,
                            increase=True, lt=True, lmin="analytic")
    jax.block_until_ready(out)
    out = {k: v[0] for k, v in out.items()}

    # float64 oracle on the f32-quantized input
    tr32 = np.asarray(jnp.asarray(vor, jnp.float32), np.float64)
    dA = np.asarray(grid.dA, np.float64)
    ctr = compat.contours_linspace(tr32, 121, True)
    ia = compat.integral_within_contours_hist(tr32, ctr, dA, None, True)
    yc, tbl = compat.area_table_hist(np.ones_like(tr32), lat, dA, True, True)
    yeq = compat.table_lookup_coordinates(tbl, yc, ia)
    Q = compat.interp_to_coords(lat, yeq, ctr, yeq[0] < yeq[-1])
    lwa = compat.local_wave_activity(tr32, Q, dA, lat, True, "all")

    # the pipeline's default LWA is the linearized kernel (f32 noise floor
    # ~5e-5 of the max — the R and E terms cancel, see kernels/lwa_pallas);
    # validate the pairwise kernel separately at the tight tolerance
    from xcontour_tpu.diagnostics.lwa import local_wave_activity
    lwa_pw = np.asarray(local_wave_activity(
        jnp.asarray(tr32, jnp.float32)[None], jnp.asarray(out["Q"])[None],
        grid.dA, grid.ydef, increase=True, method="dense")[0], np.float64)
    Q32 = np.asarray(out["Q"], np.float64)
    lwa_for_pw = compat.local_wave_activity(tr32, Q32, dA, lat, True, "all")

    # contour lengths through the Pallas marching-squares kernel
    from xcontour_tpu.diagnostics.length import contour_lengths
    got_len = np.asarray(contour_lengths(
        jnp.asarray(vor, jnp.float32)[None], jnp.asarray(ctr, jnp.float32),
        grid.ydef, grid.xdef, latlon=True)[0], np.float64)
    want_len = compat.contour_lengths(tr32, ctr, lat, lon, latlon=True)

    checks = {
        "intArea": (np.asarray(out["intArea"], np.float64), ia, 1e-6),
        "LWA (lin)": (np.asarray(out["lwa"], np.float64), lwa, 2e-4),
        "LWA (pairwise)": (lwa_pw, lwa_for_pw, 5e-6),
        "lengths": (got_len, np.where(np.isnan(want_len), np.nan, want_len),
                    1e-5),
    }
    ok = True
    for name, (got, want, tol) in checks.items():
        scale = np.nanmax(np.abs(want))
        err = np.nanmax(np.abs(got - want)) / scale
        status = "OK " if err < tol else "FAIL"
        ok &= err < tol
        print(f"  {status} {name}: max rel err {err:.2e} (tol {tol})")

    yeq_err = np.max(np.abs(np.asarray(out["Yeq"], np.float64) - yeq))
    print(f"  {'OK ' if yeq_err < 1e-3 else 'FAIL'} Yeq: max abs err "
          f"{yeq_err:.2e} deg")
    ok &= yeq_err < 1e-3

    # geometry pipelines compile + execute on hardware
    from xcontour_tpu.pipeline import clength_pipeline, fractal_pipeline
    cl = clength_pipeline(jnp.asarray(vor, jnp.float32), grid, N=61,
                          increase=True, lt=True)
    fr = fractal_pipeline(jnp.asarray(vor, jnp.float32), grid, N=31,
                          strides=(1, 2, 4), increase=True, lt=True)
    L = np.asarray(cl["lengths"])
    D = np.asarray(fr["D"])
    geom_ok = (np.isfinite(L).sum() > 40 and np.isfinite(D).sum() > 15
               and 0.9 < np.nanmedian(D[np.isfinite(D)]) < 1.8)
    print(f"  {'OK ' if geom_ok else 'FAIL'} geometry pipelines: "
          f"{np.isfinite(L).sum()}/61 lengths finite, median D "
          f"{np.nanmedian(D[np.isfinite(D)]):.2f}")
    ok &= geom_ok

    # throughput — fetch-forced chained slope timing: block_until_ready does
    # not synchronize through this remote runtime (see bench.device_time)
    B = 32
    rng = np.random.default_rng(0)
    tr = jnp.asarray(vor[None] * (1 + 1e-4 * rng.standard_normal((B, 1, 1))),
                     jnp.float32)

    @jax.jit
    def step(t):
        lwa = keff_lwa_pipeline(t, grid, N=121, increase=True, lt=True,
                                lmin="analytic")["lwa"]
        return t + 1e-30 * lwa

    def run(n):
        o = tr
        t0 = time.perf_counter()
        for _ in range(n):
            o = step(o)
        float(jnp.sum(o[0, 0, :8]))
        return time.perf_counter() - t0

    run(1)
    t1, t2 = run(2), run(12)
    sps = 10 * B / (t2 - t1)
    print(f"  throughput: {sps:.0f} snapshots/sec (B={B}, chained+fetched)")

    print("TPU smoke:", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
