"""Same-window headline A/B: attribute cross-round throughput deltas.

Run the identical headline measurement (median-of-3 chained slopes on
keff_lwa_pipeline, exactly bench.headline's method) against TWO package
versions interleaved in the SAME contention window:

    git worktree add /tmp/r2repo <old-commit>
    export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache
    for i in 1 2 3; do
      PYTHONPATH=/root/.axon_site:/tmp/r2repo python tools/ab_headline.py old
      PYTHONPATH=/root/.axon_site:/root/repo   python tools/ab_headline.py new
    done

Each line carries an in-window copy-bandwidth probe so the window quality
is visible next to the number.  If old==new in-window, a cross-round
headline delta was chip contention; if old>new, it is a code regression
to bisect.  (Round-4 finding: round-2's 16,587 vs round-3's 12,911 was
the window — same-window A/B showed the round-4 code 5% FASTER than the
round-2 code.  See docs/PERF.md.)
"""
import json
import os
import sys
import time

import numpy as np

tag = sys.argv[1]

import jax
import jax.numpy as jnp


def device_time(step, x0, reps=16, r1=2):
    def run(n):
        o = x0
        t0 = time.perf_counter()
        for _ in range(n):
            o = step(o)
        float(jnp.sum(o.ravel()[:8]))
        return time.perf_counter() - t0

    run(1)
    t1 = run(r1)
    t2 = run(r1 + reps)
    # same congested-window inversion guard as bench.device_time
    ub = t2 / (r1 + reps)
    slope = (t2 - t1) / reps
    return ub if slope <= 0 else min(slope, ub)


from xcontour_tpu import grid as G
from xcontour_tpu.pipeline import keff_lwa_pipeline
from xcontour_tpu.utils.ncio import load_dataset

ds = load_dataset("/root/reference/Data/barotropic_vorticity.nc")
vor = np.asarray(ds["absolute_vorticity"], np.float32)
lat = np.asarray(ds["latitude"], np.float64)
lon = np.asarray(ds["longitude"], np.float64)

batch, N = 32, 121
grid = G.from_latlon(lat, lon, dtype=jnp.float32)
rng = np.random.default_rng(0)
snaps = vor[None] * (1.0 + 1e-4 * rng.standard_normal((batch, 1, 1)))
tr = jnp.asarray(snaps, jnp.float32)


@jax.jit
def step(t):
    out = keff_lwa_pipeline(t, grid, N=N, increase=True, lt=True,
                            lmin="analytic")
    dep = (out["lwa"] + out["nkeff"][..., 0, None, None]
           + out["Yeq"][..., 0, None, None])
    return t + 1e-30 * dep


# in-window contention probe: big HBM copy rate
big = jnp.asarray(np.zeros((64, 256, 512), np.float32))


@jax.jit
def copy(x):
    return x + jnp.float32(1.0)


ct = device_time(copy, big, reps=16)
copy_gbps = 2 * big.size * 4 / ct / 1e9

per = float(np.median([device_time(step, tr, reps=16) for _ in range(3)]))
print(json.dumps({"tag": tag, "sps": round(batch / per, 1),
                  "per_call_ms": round(per * 1e3, 3),
                  "copy_gbps": round(copy_gbps, 1)}), flush=True)
