"""Randomized differential fuzz campaign: jitted pipelines vs the float64
NumPy oracle (compat.py), full-chain, many random configurations.

The bounded suite (tests/test_fuzz_paths.py) pins 8 seeds per family; this
tool runs the same class of comparison open-endedly for a wall-clock budget
so rare edge cases (degenerate fields, hostile masks, NaN patterns, flag
corners) get swept between rounds:

    python tools/fuzz_campaign.py [seconds=600] [start_seed=0]

Prints one line per FAILING seed (reproduce by rerunning with that seed as
start and budget ~1) and a summary; exit code 1 on any failure.
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp

from xcontour_tpu import compat
from xcontour_tpu import grid as G
from xcontour_tpu.pipeline import keff_pipeline, lwa_pipeline


def _field(rng, style, Ny, Nx, lat):
    if style == 0:      # monotone ramp + noise (the friendly case)
        f = np.sin(np.deg2rad(lat))[:, None] + 0.15 * rng.normal(
            size=(Ny, Nx))
    elif style == 1:    # cumsum walk (non-monotone rows)
        f = np.cumsum(rng.normal(size=(Ny, Nx)), axis=0)
    elif style == 2:    # two-valued (massive level ties)
        f = rng.integers(0, 2, size=(Ny, Nx)).astype(np.float64)
        f += 1e-3 * rng.normal(size=(Ny, Nx))
    else:               # large offset + tiny signal (cancellation)
        f = 1e4 + rng.normal(size=(Ny, Nx))
    return f * rng.uniform(0.1, 10.0)


def one(seed: int) -> list:
    rng = np.random.default_rng(seed)
    Ny = int(rng.integers(8, 48))
    Nx = int(rng.integers(8, 64))
    N = int(rng.integers(5, 42))
    increase = bool(rng.integers(0, 2))
    lt = bool(rng.integers(0, 2))
    hist = bool(rng.integers(0, 2))
    lmin = ("analytic", "dxF", "frac")[int(rng.integers(0, 3))]
    style = int(rng.integers(0, 4))

    lat = np.linspace(-80.0, 80.0, Ny)
    lon = np.arange(Nx) * (360.0 / Nx)
    grid = G.from_latlon(lat, lon, dtype=jnp.float64)
    dA = np.asarray(grid.dA, np.float64)
    dxF = np.asarray(grid.dxF, np.float64)

    f = _field(rng, style, Ny, Nx, lat)
    if rng.integers(0, 2):
        f[rng.uniform(size=f.shape) < 0.1] = np.nan
    mask = np.ones((Ny, Nx))
    if rng.integers(0, 2):     # a topography blob
        cy, cx = rng.integers(0, Ny), rng.integers(0, Nx)
        ry, rx = int(rng.integers(1, max(2, Ny // 3))), \
            int(rng.integers(1, max(2, Nx // 3)))
        yy, xx = np.ogrid[:Ny, :Nx]
        mask[((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2 < 1.0] = 0.0
        if mask.sum() < 4:
            mask[:] = 1.0
        f = np.where(mask != 0, f, np.nan)
    grdS = rng.uniform(0.0, 2.0, size=(Ny, Nx))
    pre_y = np.linspace(lat[1], lat[-2], 7)

    fails = []

    def cmp(name, got, want, rtol=5e-9):
        got = np.asarray(got, np.float64).reshape(-1)
        want = np.asarray(want, np.float64).reshape(-1)
        if got.shape != want.shape:
            fails.append(f"{name}: shape {got.shape} vs {want.shape}")
            return
        bad_nan = (np.isnan(got) != np.isnan(want))
        scale = np.nanmax(np.abs(want)) if np.isfinite(want).any() else 1.0
        both = np.isfinite(got) & np.isfinite(want)
        # inf-vs-finite disagreements count as errors through the same path
        num = ~both & ~np.isnan(got) & ~np.isnan(want) & (got != want)
        err = np.zeros_like(got)
        err[both] = np.abs(got[both] - want[both])
        tol = rtol * max(scale, 1e-300)
        if bad_nan.any() or num.any() or (err > tol).any():
            fails.append(
                f"{name}: maxerr {err.max():.3e} tol {tol:.3e} "
                f"nan-mismatch {int(bad_nan.sum())} inf-mismatch "
                f"{int(num.sum())}")

    # ---- Keff chain -------------------------------------------------------
    want = compat.keff_snapshot(f, grdS, lat, dA, dxF, mask, pre_y, N=N,
                                increase=increase, lt=lt, hist=hist,
                                lmin=lmin)
    got = keff_pipeline(jnp.asarray(f)[None], grid,
                        grdS=jnp.asarray(grdS)[None],
                        mask=jnp.asarray(mask, jnp.float64),
                        pre_y=jnp.asarray(pre_y), N=N, increase=increase,
                        lt=lt, hist=hist, lmin=lmin)
    for key in ("contour", "intArea", "Yeq", "intgrdS", "dgrdSdA", "dqdA",
                "Leq2", "Lmin", "nkeff"):
        cmp(f"keff.{key}", got["origin"][key][0], want["origin"][key])
    for key in ("Yeq", "nkeff"):
        cmp(f"keff.interp.{key}", got["interp"][key][0],
            want["interp"][key])

    # ---- LWA chain (reference-exact dense path) ---------------------------
    part = ("all", "upper", "lower")[int(rng.integers(0, 3))]
    wl = compat.lwa_snapshot(f, lat, dA, mask, N=N, increase=increase,
                             lt=lt, part=part)
    gl = lwa_pipeline(jnp.asarray(f)[None], grid,
                      mask=jnp.asarray(mask, jnp.float64), N=N,
                      increase=increase, lt=lt, part=part,
                      lwa_method="dense")
    for key, ref in (("Q", wl["Q"]), ("lwa", wl["lwa"]),
                     ("lwa2", wl["lwa2"])):
        cmp(f"lwa.{key}[{part}]", gl[key][0], ref)

    # ---- geometry: marching-squares lengths + box counting ----------------
    from xcontour_tpu.diagnostics.length import (contour_lengths,
                                                 contour_crossing)
    ctr = compat.contours_linspace(f, N, increase)
    wlen = compat.contour_lengths(f, ctr, lat, lon, latlon=True)
    glen = contour_lengths(jnp.asarray(f), jnp.asarray(ctr),
                           jnp.asarray(lat), jnp.asarray(lon), latlon=True)
    cmp("geom.lengths", glen, wlen)
    stride = int(rng.integers(1, 4))
    quirks = bool(rng.integers(0, 2))
    lev = float(ctr[N // 2])
    if np.isfinite(lev):
        wcr = compat.contour_crossing(f, lev, dA, stride, quirks=quirks)
        gcr = contour_crossing(jnp.asarray(f), jnp.asarray([lev]),
                               jnp.asarray(dA), stride, quirks=quirks)
        cmp("geom.crossing", np.asarray(gcr), np.asarray([wcr]))
    return fails


def main():
    budget = float(sys.argv[1]) if len(sys.argv) > 1 else 600.0
    seed0 = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    t0 = time.time()
    seed, nfail = seed0, 0
    while time.time() - t0 < budget:
        if (seed - seed0) % 20 == 19:
            # every config compiles ~8 fresh programs (unique shapes); after
            # ~130 configs the accumulated executables crash this image's
            # CPU client in libgcc unwinding (dmesg-verified segfaults at
            # ~30 min, different seeds each run) — bound the cache instead
            jax.clear_caches()
        try:
            fails = one(seed)
        except Exception as e:  # a crash is a finding, not the end of the sweep
            fails = [f"CRASH {type(e).__name__}: {str(e)[:160]}"]
        if fails:
            nfail += 1
            for msg in fails:
                print(f"FAIL seed {seed}: {msg}", flush=True)
        seed += 1
    n = seed - seed0
    print(f"fuzz campaign: {n} configs in {time.time() - t0:.0f}s, "
          f"{nfail} failing seeds")
    return 1 if nfail else 0


if __name__ == "__main__":
    sys.exit(main())
