#!/usr/bin/env python
"""Benchmark suite: headline throughput, per-kernel rooflines, the full
workload matrix, and an out-of-core streaming run — one JSON line out.

Headline (BASELINE.json north star): the combined effective-diffusivity +
local-wave-activity chain on 256x512 global vorticity snapshots, N=121
contours (the bundled Data/barotropic_vorticity.nc; reference
tests/test_LWA.py:26).

Timing methodology (IMPORTANT): this environment's remote TPU runtime does
not synchronize in ``jax.block_until_ready`` (measured impossible rates —
"1692 Tflop/s" matmuls — when relying on it).  ``device_time`` therefore
chains each call through a data dependency, forces completion with a scalar
fetch, and takes the slope between two rep counts so the fixed ~30 ms tunnel
round-trip cancels.  Calibration on this chip: 268 MB elementwise stream
676 GB/s (83% of the 819 GB/s v5e HBM spec), 4096^3 f32 matmul 171 Tflop/s.
Round-1 numbers (BENCH_r01) used block_until_ready and therefore measured
enqueue rate, not device time — r02 onward is the honest series.

Baselines: the float64 reference-semantics NumPy oracle (compat.py) and a
tougher hand-vectorized float32 NumPy chain, both timed per snapshot on this
host.  The reference's literal stack (xarray + dask + xhistogram) is not
installable in this image; those layers only add interpreter/graph overhead
on top of the same NumPy kernels, so both baselines are conservative.

Rooflines use public TPU v5e ceilings: HBM 819 GB/s; VPU 8x128 lanes x 4
ALUs x ~0.94 GHz = 3.85e12 single ops/s (7.7e12 FLOP/s counting FMA as 2).
Op-count models per kernel are documented inline next to each measurement.

Prints ONE compact (< 1.5 kB) JSON line — headline first — and writes the
full detail tree (op-model formulas, measured ceilings, workload matrix,
out-of-core run, methodology) to BENCH_DETAILS.json.  ``--quick`` /
BENCH_QUICK=1 skips the tall-grid ladder, workload matrix and out-of-core
sections (< 3 min); those sections of an existing BENCH_DETAILS.json are
carried over (and marked), never nulled out.
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import numpy as np

# ---- v5e ceilings (public spec) -------------------------------------------
HBM_BW = 819e9            # bytes/s
VPU_OPS = 3.85e12         # single (non-FMA) vector ops/s
D2R = np.pi / 180.0
REARTH = 6371200.0
METRIC = "keff+lwa snapshots/sec (256x512 global grid, N=121, f32)"


# ---- pinned CPU-baseline denominators (quiet-window medians; see
# BASELINE.md "Pinned denominators") ------------------------------------------
# The live oracle reading swings ~3x with host load (BENCH_HISTORY.jsonl:
# 0.88..2.86 sps across one day), so cross-round speedup claims carry BOTH the
# live ratio and this pinned one.  Re-pin with tools/pin_baseline.py on a
# quiet host.
# 2026-08-19, load 0.05, 5 passes (tools/pin_baseline.py):
# oracle 2.223/2.284/2.330/2.375/2.409; fast 8.68/10.21/10.28/10.32/11.44
PINNED_ORACLE_SPS = 2.33
PINNED_NUMPY_FAST_SPS = 10.28


# ---------------------------------------------------------------------------
# fault handling: this image's TPU tunnel raises transient
# FAILED_PRECONDITION/UNAVAILABLE during outages that heal within minutes
# (round 4's driver capture died on one; a re-run 33 min later passed).
# ---------------------------------------------------------------------------
_TRANSIENT_MARKERS = ("UNAVAILABLE", "FAILED_PRECONDITION",
                      "DEADLINE_EXCEEDED", "ABORTED", "INTERNAL",
                      "Socket closed", "connection reset", "GOAWAY",
                      "TPU backend")


def _is_transient(exc: BaseException) -> bool:
    return any(m in repr(exc) for m in _TRANSIENT_MARKERS)


def _retry(section, fn, attempts=3, backoff_s=20.0):
    """Bounded retry on transient backend faults, geometric backoff.
    Non-transient errors propagate immediately (main() still emits the
    parseable error line)."""
    attempts = max(1, int(os.environ.get("BENCH_RETRIES", attempts)))
    for i in range(attempts):
        try:
            return fn()
        except Exception as e:  # noqa: BLE001 — classify, retry or re-raise
            if i == attempts - 1 or not _is_transient(e):
                raise
            wait = backoff_s * (2 ** i)
            print(f"# bench: transient backend fault in {section} "
                  f"(attempt {i + 1}/{attempts}): {repr(e)[:200]}; "
                  f"retrying in {wait:.0f}s", file=sys.stderr)
            time.sleep(wait)


def host_latlon_grid(lat, lon):
    """Grid with HOST (numpy) leaves, built on the CPU backend.

    Every jitted bench step *closes over* its grid, so the leaves embed as
    trace-time constants; device-resident leaves make XLA's constant handler
    fetch each one device->host DURING LOWERING — through a tunnel that is
    slow and can be down (this exact path produced round 4's rc=1 driver
    capture).  Host leaves embed with zero device traffic."""
    import jax
    import jax.numpy as jnp
    from xcontour_tpu import grid as G
    with jax.default_device(jax.devices("cpu")[0]):
        g = G.from_latlon(lat, lon, dtype=jnp.float32)
    return G.to_host(g)


# ---------------------------------------------------------------------------
# timing
# ---------------------------------------------------------------------------
def device_time(step, x0, reps=20, r1=2, passes=1):
    """Median-free slope timing: run r1 and r1+reps dependency-chained calls,
    each ending in a scalar fetch; per-call = (T2 - T1) / reps.

    ``step`` must map its input to a same-structured output (chaining) and is
    expected to fold the *computation's result* into what it returns, so no
    call can be elided or overlapped past the fetch.

    ``passes`` > 1 repeats BOTH raw timings and takes the min of each
    SEPARATELY before the slope (the _kernel_time_best rule): contention on
    this shared chip only ever ADDS time, so each min approaches the quiet
    truth.  A single pass is exposed to window-relaxation inflation — the
    chip speeding up between T1 and T2 leaves a tiny POSITIVE slope that the
    slope<=0 guard cannot catch (observed: a 113x-inflated per-level-keff
    entry and a 17x fractal entry in one congested-window run).
    """
    import jax
    import jax.numpy as jnp

    def run(n):
        o = x0
        t0 = time.perf_counter()
        for _ in range(n):
            o = step(o)
        float(jnp.sum(o.ravel()[:8]))     # tiny fetch forces the whole chain
        return time.perf_counter() - t0

    run(1)                                 # compile + warm
    t1 = min(run(r1) for _ in range(passes))
    t2 = min(run(r1 + reps) for _ in range(passes))
    # congested-window guard (same rule as _kernel_time): the shared chip
    # can speed up between the two passes, driving the slope to <= 0 — the
    # old 1e-9 clamp then reported absurd rates (observed: a "4e9 snap/s"
    # table-reuse entry).  The long pass's amortized per-call time still
    # contains the fixed ~30 ms round-trip, so it is always a valid upper
    # bound on per-call time; clamping to it can only UNDER-claim.
    ub = t2 / (r1 + reps)
    slope = (t2 - t1) / reps
    return ub if slope <= 0 else min(slope, ub)


# ---------------------------------------------------------------------------
# data
# ---------------------------------------------------------------------------
def _load():
    from xcontour_tpu.utils.ncio import load_dataset
    ds = load_dataset("/root/reference/Data/barotropic_vorticity.nc")
    return (np.asarray(ds["latitude"], np.float64),
            np.asarray(ds["longitude"], np.float64),
            np.asarray(ds["absolute_vorticity"], np.float64))


# ---------------------------------------------------------------------------
# CPU baselines
# ---------------------------------------------------------------------------
def cpu_oracle_sps(lat, lon, vor, n_snap=10, N=121):
    """Reference-semantics float64 NumPy chain (compat.py), per-snapshot
    Python loop — the reference's execution model."""
    from xcontour_tpu import compat

    grid = host_latlon_grid(lat, lon)   # host leaves: no device fetches
    dA = np.asarray(grid.dA, np.float64)
    dxF = np.asarray(grid.dxF, np.float64)
    mask = np.ones_like(vor)
    pre_y = lat

    def one(tr):
        grdS = compat.squared_gradient(tr, lat, lon)
        out = compat.keff_snapshot(tr, grdS, lat, dA, dxF, mask, pre_y, N=N,
                                   increase=True, lt=True, hist=True,
                                   lmin="analytic")
        Q = compat.interp_to_coords(lat, out["origin"]["Yeq"],
                                    out["origin"]["contour"])
        compat.local_wave_activity(tr, Q, dA, lat, increase=True)

    one(vor)                                # warm caches
    t0 = time.perf_counter()
    for i in range(n_snap):
        one(vor * (1.0 + 1e-6 * (i + 1)))
    return n_snap / (time.perf_counter() - t0)


def cpu_numpy_fast_sps(lat, lon, vor, n_snap=10, N=121):
    """Tougher baseline: hand-vectorized float32 NumPy Keff+LWA — same
    algorithmic content as the pipeline (gradient, two weighted CDFs, table
    lookup, area derivatives, sorted profile, O(Ny^2 Nx) LWA), none of the
    oracle's generality."""
    n_snap = max(n_snap, 30)   # fast chain: time longer to keep run-to-run
    # variance under 10%
    lat32 = lat.astype(np.float32)
    Ny, Nx = vor.shape
    dy = (np.gradient(lat) * D2R * REARTH).astype(np.float32)
    dx = (np.cos(lat * D2R)[:, None]
          * (np.gradient(lon) * D2R * REARTH)[None, :]).astype(np.float32)
    latE = np.concatenate([[lat[0] - (lat[1] - lat[0]) / 2],
                           (lat[:-1] + lat[1:]) / 2,
                           [lat[-1] + (lat[-1] - lat[-2]) / 2]])
    latE = np.clip(latE, -90, 90)
    dlam = float(np.mean(np.gradient(lon)))
    dA = (REARTH ** 2 * np.abs(np.diff(np.sin(latE * D2R)))[:, None]
          * np.full((1, Nx), dlam * D2R)).astype(np.float32)
    areaY = np.cumsum(dA.sum(axis=1)).astype(np.float32)  # A(y<=y_k), lt=True

    def one(q):
        q = q.astype(np.float32)
        qx = (np.roll(q, -1, 1) - np.roll(q, 1, 1)) * 0.5 / dx
        qy = np.empty_like(q)
        qy[1:-1] = (q[2:] - q[:-2]) * 0.5
        qy[0] = q[1] - q[0]
        qy[-1] = q[-1] - q[-2]
        qy /= dy[:, None]
        grdS = qx * qx + qy * qy
        ctr = np.linspace(q.min(), q.max(), N, dtype=np.float32)
        edges = np.concatenate([[ctr[0] - (ctr[1] - ctr[0])], ctr])
        qf = q.ravel()
        h_a, _ = np.histogram(qf, bins=edges, weights=dA.ravel())
        h_g, _ = np.histogram(qf, bins=edges, weights=(grdS * dA).ravel())
        intArea = np.cumsum(h_a).astype(np.float32)
        intgrdS = np.cumsum(h_g).astype(np.float32)
        Yeq = np.interp(intArea, areaY, lat32)
        dgrdSdA = np.gradient(intgrdS) / np.gradient(intArea)
        dqdA = np.gradient(ctr) / np.gradient(intArea)
        Leq2 = dgrdSdA / (dqdA * dqdA)
        Lmin = 2 * np.pi * REARTH * np.cos(Yeq * D2R)
        nkeff = Leq2 / (Lmin * Lmin)
        Q = np.interp(lat32, Yeq, ctr).astype(np.float32)
        wei = (dA / dA.max() * dA).astype(np.float32)
        lwa = np.empty_like(q)
        for j in range(Ny):                  # O(Ny^2 Nx), vectorized inner
            qe = q - Q[j]
            m = np.zeros_like(q)
            sel = np.arange(Ny)[:, None] >= j
            m[sel & (qe < 0)] = 1.0
            m[~sel & (qe > 0)] = -1.0
            lwa[j] = -(qe * m * wei).sum(axis=0)
        return nkeff, lwa

    one(vor)
    t0 = time.perf_counter()
    for i in range(n_snap):
        one(vor * (1.0 + 1e-6 * (i + 1)))
    return n_snap / (time.perf_counter() - t0)


# ---------------------------------------------------------------------------
# TPU sections
# ---------------------------------------------------------------------------
def headline(lat, lon, vor, batch=32, N=121, lwa_method="auto"):
    import jax
    import jax.numpy as jnp
    from xcontour_tpu.pipeline import keff_lwa_pipeline

    # host-leaf grid: the jitted step closes over it, and numpy constants
    # embed with no trace-time device->host fetch (VERDICT r4 #1c)
    grid = host_latlon_grid(lat, lon)
    rng = np.random.default_rng(0)
    snaps = vor[None] * (1.0 + 1e-4 * rng.standard_normal((batch, 1, 1)))
    tr = jnp.asarray(snaps, jnp.float32)

    @jax.jit
    def step(t):
        out = keff_lwa_pipeline(t, grid, N=N, increase=True, lt=True,
                                lmin="analytic", lwa_method=lwa_method)
        # fold the full result set back into the next input: nothing can be
        # dead-code-eliminated or deferred past the fetch
        dep = (out["lwa"] + out["nkeff"][..., 0, None, None]
               + out["Yeq"][..., 0, None, None])
        return t + 1e-30 * dep

    # median of three slope measurements: run-to-run variance on this shared
    # chip is ~10% and the headline should not ride an outlier
    per = float(np.median([device_time(step, tr, reps=16) for _ in range(3)]))
    sps = batch / per

    # output sanity on a real (unchained) call
    out = keff_lwa_pipeline(tr, grid, N=N, increase=True, lt=True,
                            lmin="analytic", lwa_method=lwa_method)
    nk = np.asarray(out["nkeff"])
    assert np.isfinite(nk).sum() > nk.size * 0.5, "benchmark output degenerate"
    return sps


def adjoint_section(lat, lon, vor, batch=32, N=121, era5=False):
    """Gradient-step throughput of the combined diagnostic: one
    jit(grad(nansum(LWA^2) + nansum(nkeff))) per batch — the adjoint
    capability the reference stack cannot express, measured at the headline
    workload shape.  The custom VJPs route the backward through the XLA
    twins of the Pallas forwards."""
    import jax
    import jax.numpy as jnp
    from xcontour_tpu.pipeline import keff_lwa_pipeline

    grid = host_latlon_grid(lat, lon)
    rng = np.random.default_rng(0)
    snaps = vor[None] * (1.0 + 1e-4 * rng.standard_normal((batch, 1, 1)))
    tr = jnp.asarray(snaps, jnp.float32)

    def loss(t):
        out = keff_lwa_pipeline(t, grid, N=N, increase=True, lt=True,
                                lmin="analytic")
        return jnp.nansum(out["lwa"] * out["lwa"]) + jnp.nansum(out["nkeff"])

    @jax.jit
    def gstep(t):
        g = jax.grad(loss)(t)
        return t + 1e-30 * g

    g = np.asarray(jax.grad(loss)(tr))
    finite = float(np.isfinite(g).mean())
    per = float(np.median([device_time(gstep, tr, reps=8) for _ in range(3)]))
    out = {"grad_sps": round(batch / per, 1),
           "grad_finite_fraction": finite,
           "loss": "nansum(LWA^2) + nansum(nkeff), 256x512 N=121 f32",
           "note": ("full forward+backward per step; TPU-vs-CPU f32 "
                    "gradient parity ~3e-5 (test_differentiable.py)")}
    if era5:
        Ny, Nx, B2, N2 = 721, 1440, 4, 241
        lat2 = np.linspace(-90, 90, Ny)
        lon2 = np.linspace(0, 360 - 360 / Nx, Nx)
        grid2 = host_latlon_grid(lat2, lon2)
        base = (np.sin(np.deg2rad(lat2))[:, None]
                + 0.2 * np.cos(4 * np.deg2rad(lon2))[None, :]
                * np.cos(np.deg2rad(lat2))[:, None])
        tr2 = jnp.asarray(base[None] * (1 + 1e-3 * rng.standard_normal(
            (B2, 1, 1))), jnp.float32)

        def loss2(t):
            o = keff_lwa_pipeline(t, grid2, N=N2, lmin="analytic")
            return jnp.nansum(o["lwa"] * o["lwa"]) + jnp.nansum(o["nkeff"])

        @jax.jit
        def gstep2(t):
            return t + 1e-30 * jax.grad(loss2)(t)

        per2 = float(np.median([device_time(gstep2, tr2, reps=4)
                                for _ in range(2)]))
        out["era5_grad_sps"] = round(B2 / per2, 1)
        out["era5_shape"] = "721x1440 N=241 f32"
    return out


def _kernel_time(kernel_of_x, x0, inner_lo=2, inner_hi=10, reps=8):
    """Per-invocation kernel time with BOTH overheads cancelled: the outer
    slope (device_time) removes the tunnel round-trip, and an inner slope —
    the same kernel chained inner_lo vs inner_hi times inside one jitted
    program — removes the per-launch dispatch cost.  Chaining (x depends on
    the previous kernel's output) makes in-trace CSE impossible."""
    import jax

    def make(inner):
        @jax.jit
        def step(x):
            for _ in range(inner):
                x = x + 1e-30 * kernel_of_x(x)
            return x
        return step

    t_hi = device_time(make(inner_hi), x0, reps=reps)
    t_lo = device_time(make(inner_lo), x0, reps=reps)
    # same garbled-slope guard as _kernel_time_best: a congested window can
    # measure t_hi <= t_lo, and the raw slope then reports 0.0 ms for a real
    # workload (observed: clength/local_length in the 11:34 run).  The
    # amortized per-iteration time of the long chain is always a valid
    # upper bound, and clamping to it can only UNDER-claim.
    ub = t_hi / inner_hi
    slope = (t_hi - t_lo) / (inner_hi - inner_lo)
    return ub if slope <= 0 else min(slope, ub)


def _kernel_time_best(kernel_of_x, x0, passes=3, inner_lo=2, inner_hi=10,
                      reps=8):
    """Contention-robust kernel time.  Contention on this shared chip only
    ever ADDS time, so min-over-passes is the honest estimate — but it must
    be taken on the two RAW chain timings separately, not on their
    difference (a noisy pass can measure t_hi < t_lo, and min() over such
    differences latches onto the garbage).  Measured swing between windows
    is ~2x; a single pass can land a roofline claim on an outlier."""
    import jax

    def make(inner):
        @jax.jit
        def step(x):
            for _ in range(inner):
                x = x + 1e-30 * kernel_of_x(x)
            return x
        return step

    hi, lo = make(inner_hi), make(inner_lo)
    t_hi = min(device_time(hi, x0, reps=reps) for _ in range(passes))
    t_lo = min(device_time(lo, x0, reps=reps) for _ in range(passes))
    # t_hi/inner_hi = per-iteration time INCLUDING the amortized dispatch
    # cost, so it is always a valid upper bound on the true kernel time.
    # Clamping to it keeps a congestion-garbled slope (observed: negative,
    # or near-zero — which then inflates the self-calibrating ceiling and
    # zeroes every other kernel's roofline pct) from ever being reported;
    # the clamp can only UNDER-claim performance.
    ub = t_hi / inner_hi
    slope = (t_hi - t_lo) / (inner_hi - inner_lo)
    return ub if slope <= 0 else min(slope, ub)


def vpu_probe(batch=32, Ny=256, Nx=512, iters=128, chains=8):
    """Fixed in-window VPU calibration: measured slots/s on THIS chip RIGHT
    NOW.  The probe iterates ``chains`` INDEPENDENT quadratic recurrences
    x_i <- a*x_i - x_i*x_i (FMA-as-1-slot + multiply = 2 slots per
    element-iteration) on a VMEM-resident f32 block.  Quadratic, so XLA
    cannot collapse the chain the way it would an affine one; independent
    chains so the VPU pipelines stay FULL — a single chain is
    latency-bound at ~0.75 Tslots/s (measured), while 8 interleaved chains
    sustain ~3.8 Tslots/s ~= the 3.85 T spec on this chip (measured ladder:
    2 chains 1.5 T, 4 chains 3.2 T, 8 chains 3.8 T flat from 64 to 128
    iters).  Its measured rate is the same-window denominator for each VPU
    kernel's pct_of_measured_ceiling — the analogue of the stencil's
    pallas-copy ceiling — so kernel-quality claims separate from chip
    contention (observed ~2x swings between windows on this shared chip)."""
    import jax
    import jax.numpy as jnp

    x0 = jnp.asarray(
        np.random.default_rng(5).uniform(0.1, 0.2, (batch, Ny, Nx)),
        jnp.float32)

    def body(x):
        a = jnp.float32(1.0000001)
        xs = [x * jnp.float32(1 + 0.01 * i) for i in range(chains)]
        for _ in range(iters):
            xs = [a * y - y * y for y in xs]
        return sum(xs)

    t = _kernel_time_best(body, x0, inner_lo=1, inner_hi=3, reps=8)
    ops = batch * Ny * Nx * iters * chains * 2
    return dict(slots_per_s=ops / t, t=t,
                model=f"B*Ny*Nx*{iters} iters * {chains} independent "
                      "chains * 2 slots (FMA + mul), quadratic recurrences "
                      "(not XLA-collapsible, pipeline-filling)")


# ---------------------------------------------------------------------------
# per-kernel STRUCTURE probes (VERDICT r4 #3): for each VPU kernel, a twin
# pallas kernel with the IDENTICAL grid, block specs, and loop structure whose
# body does the op model's slot count as pipeline-friendly independent work —
# the reduction/one-hot machinery removed.  Its measured rate is a ceiling the
# kernel could actually reach at this structure (the exact analogue of the
# stencil's same-blocking pallas-copy ceiling): kernel ~ probe proves the op
# model's gap is structural (reduction latency, grid/dispatch, DMA), a fast
# probe proves real headroom.
# ---------------------------------------------------------------------------
def _lwa_structure_probe(q, Q, W):
    """Twin of kernels/lwa_pallas._kernel_lin's surface loop: same
    (B, n_xb, ntj) grid, same blocks, same unrolled _TJ fori; per (surface,
    cell) the same 3 slots (sub, clamp, fused mul-accumulate) — but the
    accumulate is ELEMENTWISE into a carried panel instead of the kernel's
    cross-sublane row reduction."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from xcontour_tpu.kernels.lwa_pallas import _TJ, _choose_nxb

    B, Ny, Nx = q.shape
    ntj = pl.cdiv(Ny, _TJ)
    nxb = _choose_nxb(Ny, q.dtype.itemsize * 2, Nx)
    assert Nx % nxb == 0
    n_xb = Nx // nxb

    def kernel(Qs_ref, q_ref, W_ref, out_ref, *, ny):
        b = pl.program_id(0)
        t = pl.program_id(2)
        qp = q_ref[0]
        Wp = W_ref[...]

        def body(jj, acc):
            j = t * _TJ + jj
            Qj = Qs_ref[b, jnp.minimum(j, ny - 1)]
            qe = qp - Qj                        # 1 slot
            ext = jnp.minimum(qe, 0.0)          # 1 slot
            return acc + ext * Wp               # 1 fused slot
        acc = jax.lax.fori_loop(0, _TJ, body, jnp.zeros_like(qp),
                                unroll=True)
        # fold EVERY acc row into the output tile: writing only the first
        # _TJ rows lets XLA slice-pushdown the whole elementwise chain to
        # those rows and skip 7/8 of the counted work (measured: a 35
        # Tslots/s "probe", 9x the VPU peak)
        tot = acc[:_TJ, :]
        for kblk in range(1, acc.shape[0] // _TJ):
            tot = tot + acc[kblk * _TJ:(kblk + 1) * _TJ, :]
        out_ref[0, :, :] = tot

    from functools import partial as _p
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, n_xb, ntj),
        in_specs=[
            pl.BlockSpec((1, Ny, nxb), lambda b, x, t, *_: (b, 0, x),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Ny, nxb), lambda b, x, t, *_: (0, x),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, _TJ, nxb), lambda b, x, t, *_: (b, t, x)),
    )
    import jax as _jax

    @_jax.jit
    def run(qx):
        return pl.pallas_call(
            _p(kernel, ny=Ny),
            out_shape=_jax.ShapeDtypeStruct((B, ntj * _TJ, Nx), q.dtype),
            grid_spec=grid_spec,
        )(Q, qx, W)
    return run, B * (ntj * _TJ) * Ny * Nx * 3


def _hist_structure_probe(vals, edges, wts, tile=32768):
    """Twin of kernels/hist_pallas._kernel: same (B, tiles) grid, blocks, and
    LB=16 level-block loop; per (level, element) the same 3 slots (1 shared
    cmp + 2 fused masked-accumulates) — accumulating ELEMENTWISE into carried
    panels instead of the kernel's per-level full-tile reductions + one-hot
    scratch stores."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from functools import partial as _p

    B, G = vals.shape
    N = edges.shape[-1] - 1
    lanes = 128
    rows_per_tile = max(8, tile // lanes)
    assert G % (rows_per_tile * lanes) == 0
    rows = G // lanes
    v3 = vals.reshape(B, rows, lanes)
    w4 = wts.reshape(B, 2, rows, lanes)

    def kernel(e_ref, v_ref, w_ref, out_ref, *, n_bins):
        b = pl.program_id(0)
        v = v_ref[0]
        w0 = w_ref[0, 0]
        w1 = w_ref[0, 1]
        LB = 16
        n_blk = (n_bins + LB - 1) // LB

        def body(blk, accs):
            a0, a1 = accs
            k0 = blk * LB
            for kk in range(LB):
                k_safe = jnp.minimum(k0 + kk, n_bins - 1)
                e = e_ref[b, k_safe + 1]
                below = v < e                            # 1 slot
                a0 = a0 + jnp.where(below, w0, 0.0)      # 1 fused slot
                a1 = a1 + jnp.where(below, w1, 0.0)      # 1 fused slot
            return (a0, a1)
        a0, a1 = jax.lax.fori_loop(0, n_blk, body,
                                   (jnp.zeros_like(v), jnp.zeros_like(v)),
                                   unroll=False)
        # ONE cross-sublane fold per tile (amortized over all levels) so
        # every accumulator row feeds the output — see the LWA probe's
        # slice-pushdown note
        out_ref[0, 0:1, :] = jnp.sum(a0 + a1, axis=0)[None, :]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, rows // rows_per_tile),
        in_specs=[
            pl.BlockSpec((1, rows_per_tile, lanes), lambda b, t, *_: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, rows_per_tile, lanes),
                         lambda b, t, *_: (b, 0, t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, lanes), lambda b, t, *_: (b, 0, 0)),
    )

    @jax.jit
    def run(vx):
        return pl.pallas_call(
            _p(kernel, n_bins=N),
            out_shape=jax.ShapeDtypeStruct((B, 1, lanes), vals.dtype),
            grid_spec=grid_spec,
        )(edges, vx.reshape(B, rows, lanes), w4)
    # the LB blocks run past N like the kernel; count the evaluated levels
    n_eval = ((N + 15) // 16) * 16
    return run, B * n_eval * G * 3


def _length_structure_probe(data, levels, ydef, xdef):
    """Twin of kernels/length_pallas._kernel: same (B, n_rb) grid, the same
    corner/reciprocal/trig panels, the same sorted-active-range dynamic fori,
    the kernel's EXACT per-cell op mix (_offset_block_length with
    reduce=False) — only the per-level full-panel reduction + one-hot
    scratch RMW replaced by an elementwise accumulate with one final fold.
    Isolates the reduce/flush serialization cost from the op mix itself."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from functools import partial as _p
    from xcontour_tpu.kernels.length_pallas import (
        _block_panels, _active_ranges, _offset_block_length,
        OPS_PER_CELL_LEVEL, _RB)

    B, Ny, Nx = data.shape
    Nl = levels.shape[-1]
    yd = jnp.broadcast_to(ydef, (B, Ny)).astype(data.dtype)
    xd = jnp.broadcast_to(xdef, (B, Nx)).astype(data.dtype)
    lev_b = jnp.broadcast_to(levels, (B, Nl))
    (v00, v01, v10, v11, it, ib, il, ir, cy, sy, dyr, dxc,
     valid, lo, hi, n_rb, NxC) = _block_panels(data, yd, xd, latlon=True)
    _, lev_s, n0, n1 = _active_ranges(lev_b, lo, hi)

    def kernel(lev_ref, n0_ref, n1_ref, v00_ref, v01_ref, v10_ref, v11_ref,
               it_ref, ib_ref, il_ref, ir_ref, cy_ref, sy_ref, dy_ref,
               dx_ref, valid_ref, out_ref, *, n_levels, n_rb_):
        b = pl.program_id(0)
        rb = pl.program_id(1)
        k0 = n0_ref[b * n_rb_ + rb]
        k1 = n1_ref[b * n_rb_ + rb]
        args = (v00_ref[0], v01_ref[0], v10_ref[0], v11_ref[0],
                it_ref[0], ib_ref[0], il_ref[0], ir_ref[0],
                cy_ref[0], sy_ref[0], dy_ref[0], dx_ref[0])
        vld = valid_ref[0] > 0

        def body(n, acc):
            lev = lev_ref[b * n_levels + n]
            panel = _offset_block_length(lev, *args, vld, True, reduce=False)
            return acc + panel
        acc = jax.lax.fori_loop(k0, k1, body,
                                jnp.zeros_like(v00_ref[0]), unroll=False)
        # fold every row (slice-pushdown guard, see the LWA probe note)
        out_ref[0, :, :] = jnp.sum(acc, axis=0)[None, :]

    big = pl.BlockSpec((1, _RB, NxC), lambda b, r, *_: (b, r, 0),
                       memory_space=pltpu.VMEM)
    row = pl.BlockSpec((1, _RB, 1), lambda b, r, *_: (b, r, 0),
                       memory_space=pltpu.VMEM)
    col = pl.BlockSpec((1, 1, NxC), lambda b, r, *_: (b, 0, 0),
                       memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B, n_rb),
        in_specs=[big] * 8 + [row, row, row, col, big],
        out_specs=pl.BlockSpec((1, 1, NxC), lambda b, r, *_: (b, 0, 0)),
    )

    @jax.jit
    def run(v00_in):
        # panels are prebuilt exactly like the real launcher; v00 chains
        # the timing dependency
        return pl.pallas_call(
            _p(kernel, n_levels=Nl, n_rb_=n_rb),
            out_shape=jax.ShapeDtypeStruct((B, 1, NxC), data.dtype),
            grid_spec=grid_spec,
        )(lev_s.reshape(-1), n0.reshape(-1), n1.reshape(-1),
          v00_in, v01, v10, v11, it, ib, il, ir, cy, sy, dyr, dxc,
          valid.astype(data.dtype))
    pairs = int(jnp.sum(n1 - n0))
    return run, v00, pairs * _RB * NxC * OPS_PER_CELL_LEVEL


def kernel_rooflines(lat, lon, vor, batch=32, N=121):
    """Per-Pallas-kernel device time + achieved fraction of the binding
    v5e ceiling, on the real snapshot data.  Op-count models are stated in
    each entry.

    Ceiling policy (keeps every pct_roofline honest AND <= 100): the spec
    constants (819 GB/s HBM, 3.85e12 VPU slots/s at an assumed 0.94 GHz) are
    lower bounds with unknown slack on this shared chip; a kernel measured in
    a fast window can legitimately imply a higher slot rate.  Each bound's
    ceiling is therefore max(spec, fastest rate DEMONSTRATED by any kernel in
    this same run) — a demonstrated rate is direct evidence the hardware can
    sustain it, so fractions stay meaningful, mutually comparable within the
    window, and can never exceed 100 by construction.
    """
    import jax
    import jax.numpy as jnp

    Ny, Nx = vor.shape
    from xcontour_tpu.kernels.lwa_pallas import lwa_pallas
    from xcontour_tpu.kernels.hist_pallas import histogram_pallas_multi
    from xcontour_tpu.kernels.stencil_pallas import squared_gradient_pallas
    from xcontour_tpu.kernels.length_pallas import (contour_lengths_pallas,
                                                    active_pair_count,
                                                    OPS_PER_CELL_LEVEL, _RB)

    rng = np.random.default_rng(0)
    snaps = vor[None] * (1.0 + 1e-4 * rng.standard_normal((batch, 1, 1)))
    q = jnp.asarray(snaps, jnp.float32)
    out = {}

    # bracket the kernel section with the VPU probe (again at the end) and
    # use the BEST reading as the same-window denominator: a single probe
    # placement can ride one unlucky contention slice and then every VPU
    # kernel "beats" the ceiling by 3x (observed 2026-08-19 03:25 run:
    # probe 0.73 Tslots while the kernels ran within 12% of their quiet
    # rates -> 276% readings).  max(pre, post) is still a same-window
    # demonstrated rate, so the quality claim stays contention-normalized.
    probe_pre = vpu_probe(batch=batch, Ny=Ny, Nx=Nx)

    # stencil: one VMEM pass, read q + write out (+ dx, dy once) -> HBM-bound.
    # Measured at B=512 (537 MB per invocation) so the operand cannot stay
    # on-chip across chained invocations; at the pipeline's B=32 the batch
    # fits in VMEM and runs faster than HBM speed.  Besides the HBM fraction,
    # report the fraction of a pure pallas COPY at the identical blocking
    # measured in the same window — which isolates kernel quality from chip
    # contention (spec fractions on this tunnel vary ~2x between windows).
    BS = 512
    qs = jnp.tile(q[:32], (BS // 32, 1, 1))       # tiled ON device: the host
    # tunnel moves ~16 MB/s, a 537 MB host-side tile would dominate the run.
    # All closure CONSTANTS below are numpy (host): device-resident constants
    # would be fetched device->host at trace time through the tunnel.
    dx = rng.uniform(0.5, 1.0, (Ny, Nx)).astype(np.float32)
    dy = np.ones((Ny, 1), np.float32)
    t_sten = _kernel_time_best(lambda x: squared_gradient_pallas(
        x, dx, dy, periodic_x=True, bc_y="extend"), qs,
        inner_lo=2, inner_hi=10, reps=6)

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def _copy_kernel(q_ref, o_ref):
        o_ref[...] = q_ref[...] * 1.0000001

    @jax.jit
    def _pallas_copy(x):
        return pl.pallas_call(
            _copy_kernel, out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            grid=(x.shape[0],),
            in_specs=[pl.BlockSpec((1, Ny, Nx), lambda b: (b, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, Ny, Nx), lambda b: (b, 0, 0)),
        )(x)
    t_copy = _kernel_time_best(_pallas_copy, qs, inner_lo=2, inner_hi=10, reps=6)

    bts = 2 * BS * Ny * Nx * 4 + 2 * Ny * Nx * 4
    out["stencil"] = dict(
        ms=round(t_sten * 1e3, 4), model="2*B*Ny*Nx*4B HBM traffic (B=512)",
        bytes=bts, t=t_sten,
        achieved_gbps=round(bts / t_sten / 1e9, 1),
        copy_ceiling_gbps=round(bts / t_copy / 1e9, 1),
        pct_of_copy_ceiling=round(100 * t_copy / t_sten, 1), bound="HBM")

    # LWA: O(Ny^2 Nx) reduce, VMEM-resident -> VPU-bound.  The linearized
    # kernel (mask = t + c - 1; t-term precomputed as prefixes) does 3
    # irreducible slots per (surface, cell) pair: sub, min/max clamp, and a
    # fused multiply-accumulate (the mul+add counted as ONE slot, matching
    # the header's FMA-as-1 convention — counting them separately produced
    # >100% readings in fast windows, i.e. the hardware does fuse them)
    Q = np.sort(np.mean(snaps, -1).astype(np.float32), -1)
    W = rng.uniform(0.5, 1.0, (Ny, Nx)).astype(np.float32)
    # pairwise=False: measure the linearized kernel the model describes (the
    # public kernel default is the reference-faithful pairwise form)
    t = _kernel_time_best(lambda x: lwa_pallas(x, Q, W, increase=True,
                                          pairwise=False), q)
    ops = batch * Ny * Ny * Nx * 3
    # structure twin: identical grid/blocks/loop, same 3 slots per pair,
    # reduction removed (see _lwa_structure_probe) — its rate is a ceiling
    # this structure can actually reach
    prun, pops = _lwa_structure_probe(q, np.asarray(Q, np.float32), W)
    tp = _kernel_time_best(lambda x: prun(x)[:, :Ny, :], q)
    out["lwa"] = dict(
        ms=round(t * 1e3, 4),
        model="B*Ny^2*Nx * 3 slots (sub, clamp, fused mul-accumulate)",
        ops=ops, t=t, achieved_tops=round(ops / t / 1e12, 2), bound="VPU",
        structure_probe_ms=round(tp * 1e3, 4),
        pct_of_structure_ceiling=round(
            100 * (ops / t) / (pops / tp), 1))

    # hist (2-channel CDF): per level per element 1 cmp shared across the
    # channels + per channel one fused masked-accumulate (select+add as ONE
    # slot, same convention as above)
    G = Ny * Nx
    vals = q.reshape(batch, G)
    lo, hi = float(np.nanmin(snaps)), float(np.nanmax(snaps))
    edges = np.linspace(lo, hi, N + 1)[None].repeat(batch, 0).astype(np.float32)
    wts = rng.uniform(0.5, 1.0, (batch, 2, G)).astype(np.float32)

    def hist_k(x):
        r = histogram_pallas_multi(x, edges, wts)
        return jnp.sum(r, axis=(1, 2))[:, None]
    t = _kernel_time_best(hist_k, vals)
    ops = batch * N * G * 3
    prun_h, pops_h = _hist_structure_probe(vals, edges, wts)

    def hist_p(x):
        r = prun_h(x)
        return jnp.sum(r, axis=(1, 2))[:, None]
    tp_h = _kernel_time_best(hist_p, vals)
    out["hist_cdf2"] = dict(
        ms=round(t * 1e3, 4),
        model="B*N*G * (1 shared cmp + 2 fused masked-accumulates)",
        ops=ops, t=t, achieved_tops=round(ops / t / 1e12, 2), bound="VPU",
        structure_probe_ms=round(tp_h * 1e3, 4),
        pct_of_structure_ceiling=round(
            100 * (ops / t) / (pops_h / tp_h), 1))

    # marching-squares lengths, measured-active-block model: levels are
    # sorted and each row block loops over exactly its active level range, so
    # the work actually dispatched is active_pairs * cells_per_block *
    # OPS_PER_CELL_LEVEL (the honest slot count of _offset_block_length,
    # documented in its docstring).  Full-range levels on the real snapshot
    # make this the kernel's dense worst case.
    levels = np.linspace(lo, hi, N)[None].repeat(batch, 0).astype(np.float32)
    ydef = np.deg2rad(lat).astype(np.float32)
    xdef = np.deg2rad(lon).astype(np.float32)

    def len_k(x):
        r = contour_lengths_pallas(x, levels, ydef, xdef, latlon=True)
        return jnp.sum(r, axis=1)[:, None, None]
    t = _kernel_time_best(len_k, q, inner_lo=1, inner_hi=5, reps=4)
    pairs = int(active_pair_count(q, levels))
    ops = pairs * _RB * (Nx - 1) * OPS_PER_CELL_LEVEL
    prun_l, v00_l, pops_l = _length_structure_probe(q, levels, ydef, xdef)

    def len_p(v):
        r = prun_l(v)                     # (B, 1, NxC)
        return jnp.sum(r, axis=(1, 2))[:, None, None]   # chains with v00
    tp_l = _kernel_time_best(len_p, v00_l, inner_lo=1, inner_hi=5, reps=4)
    out["length"] = dict(
        ms=round(t * 1e3, 4),
        model=(f"active_block_level_pairs({pairs}) * {_RB}*(Nx-1) cells * "
               f"{OPS_PER_CELL_LEVEL} ops (measured-active-block)"),
        ops=ops, t=t, achieved_tops=round(ops / t / 1e12, 2), bound="VPU",
        structure_probe_ms=round(tp_l * 1e3, 4),
        pct_of_structure_ceiling=round(
            100 * (ops / t) / (pops_l / tp_l), 1))

    # same-window measured VPU ceiling: the fixed probe's demonstrated
    # slot rate.  Every VPU kernel reports pct_of_measured_ceiling against
    # it — the exact analogue of the stencil's pct_of_copy_ceiling — so a
    # congested window deflates kernel rate and denominator together and
    # the quality claim survives contention.
    probe_post = vpu_probe(batch=batch, Ny=Ny, Nx=Nx)
    probe = max(probe_pre, probe_post, key=lambda p: p["slots_per_s"])

    # self-calibrating ceilings (see docstring): never report > 100%
    vpu_ceiling = max([VPU_OPS, probe["slots_per_s"]]
                      + [e["ops"] / e["t"] for e in out.values()
                         if e["bound"] == "VPU"])
    hbm_ceiling = max(HBM_BW, bts / t_sten, bts / t_copy)
    for e in out.values():
        if e["bound"] == "VPU":
            e["pct_roofline"] = round(100 * e["ops"] / e["t"] / vpu_ceiling, 1)
            e["pct_of_measured_ceiling"] = round(
                100 * e["ops"] / e["t"] / probe["slots_per_s"], 1)
            del e["t"]
        else:
            e["pct_roofline"] = round(100 * e["bytes"] / e["t"] / hbm_ceiling,
                                      1)
            e["pct_of_measured_ceiling"] = e["pct_of_copy_ceiling"]
            del e["t"], e["bytes"]
    out["ceilings"] = dict(
        vpu_slots_per_s=vpu_ceiling, hbm_bytes_per_s=hbm_ceiling,
        vpu_probe_slots_per_s=round(probe["slots_per_s"], -9),
        vpu_probe_model=probe["model"],
        note=("pct_roofline: max(v5e spec, fastest rate demonstrated in "
              "this run) — never > 100.  pct_of_measured_ceiling: the "
              "same-window measured denominator (VPU probe / pallas copy), "
              "contention-normalized, may legitimately exceed 100 when a "
              "kernel out-runs the probe's demonstrated rate.  "
              "pct_of_structure_ceiling: vs a twin pallas kernel with the "
              "IDENTICAL grid/blocks/loop doing the op model's slot count "
              "as pipeline-optimal independent work (reductions removed) — "
              "the binding-resource proof: >= 100 means the kernel already "
              "beats the best this structure demonstrated (its op-model "
              "gap is structural: reduction latency, dispatch, DMA); well "
              "below 100 means real headroom at this structure."))
    # contention index for the history ledger: in-window copy bandwidth and
    # VPU probe rate — reruns compare these to tell a code regression from
    # a congested window
    out["contention"] = dict(
        copy_gbps=round(bts / t_copy / 1e9, 1),
        vpu_probe_tslots=round(probe["slots_per_s"] / 1e12, 2),
        vpu_probe_pre_post_tslots=[
            round(probe_pre["slots_per_s"] / 1e12, 2),
            round(probe_post["slots_per_s"] / 1e12, 2)])
    return out


def lwa_tall(batch=4, Ny=8192, Nx=512, N=121):
    """Tall-grid LWA: hardware evidence for the 'fast' (sort-merge) path
    auto-crossover at Ny >= _FAST_NY_CROSSOVER (diagnostics/lwa.py).  Returns
    per-method times and the auto-resolved pick."""
    import jax.numpy as jnp
    from xcontour_tpu.diagnostics.lwa import (local_wave_activity,
                                              _resolve_method,
                                              _FAST_NY_CROSSOVER)

    rng = np.random.default_rng(3)
    ydef = np.linspace(-89.9, 89.9, Ny)
    base = 2e-4 * np.sin(np.deg2rad(ydef))[:, None]
    qn = (base[None] * (1 + 1e-3 * rng.standard_normal((batch, 1, 1)))
          + 2e-6 * rng.standard_normal((batch, Ny, Nx))).astype(np.float32)
    q = jnp.asarray(qn)
    # closure constants stay numpy (host) — no trace-time device fetches
    dA = (np.cos(np.deg2rad(ydef))[:, None]
          * np.ones((1, Nx)) * 1e8).astype(np.float32)
    Q = np.sort(np.mean(qn, -1), -1)
    yd = ydef.astype(np.float32)

    res = {"ny": Ny, "auto_resolves_to": _resolve_method("auto", "all", Ny),
           "crossover_ny": _FAST_NY_CROSSOVER}
    for m in ("fast", "lin"):
        def step(x, m=m):
            o = local_wave_activity(x, Q, dA, yd, increase=True, method=m)
            return x + 1e-30 * o
        t = _kernel_time(step, q, inner_lo=1, inner_hi=5, reps=4)
        res[f"{m}_ms"] = round(t * 1e3, 2)
    res["fast_wins"] = bool(res["fast_ms"] < res["lin_ms"])
    return res


def workload_matrix(lat, lon, vor):
    import jax
    import jax.numpy as jnp
    from xcontour_tpu.pipeline import (keff_lwa_pipeline, clength_pipeline,
                                       fractal_pipeline)
    from xcontour_tpu.diagnostics.local_length import local_contour_lengths

    out = {}
    grid = host_latlon_grid(lat, lon)
    rng = np.random.default_rng(1)

    # ERA5-scale 0.25-degree grid (exercises the X-panel-blocked LWA kernel)
    NyE, NxE = 721, 1440
    latE = np.linspace(-90, 90, NyE)
    lonE = np.arange(0, 360, 0.25)
    gridE = host_latlon_grid(latE, lonE)
    base = (2e-4 * np.sin(np.deg2rad(latE))[:, None]
            + 4e-5 * np.sin(5 * np.deg2rad(lonE))[None, :])
    BE = 4
    trE = jnp.asarray(base[None] * (1 + 1e-3 * rng.standard_normal((BE, 1, 1)))
                      + 2e-6 * rng.standard_normal((BE, NyE, NxE)), jnp.float32)

    @jax.jit
    def stepE(t):
        o = keff_lwa_pipeline(t, gridE, N=241, increase=True, lt=True,
                              lmin="analytic")
        return t + 1e-30 * (o["lwa"] + o["nkeff"][..., 0, None, None])
    per = device_time(stepE, trE, reps=6, passes=3)
    out["era5_keff_lwa_sps"] = round(BE / per, 1)

    # production-loop variant: the A(Y_eq) table is tracer-independent, so
    # real archive sweeps build it once and pass it in (same convention as
    # the reference drivers, which construct the grid/metrics once)
    from xcontour_tpu import core as _core
    maskE = np.ones(gridE.shape, np.float32)
    tableE = _core.cal_area_eqCoord_table_hist(
        maskE, np.asarray(gridE.ydef, np.float32),
        np.asarray(gridE.dA, np.float32), increase=True, lt=True)
    # stepE2 closes over the table: pull its leaves to host ONCE here (a
    # bounded setup fetch under _retry) so lowering embeds numpy constants
    tableE = jax.tree_util.tree_map(np.asarray, tableE)

    @jax.jit
    def stepE2(t):
        o = keff_lwa_pipeline(t, gridE, N=241, increase=True, lt=True,
                              lmin="analytic", table=tableE)
        return t + 1e-30 * (o["lwa"] + o["nkeff"][..., 0, None, None])
    per = device_time(stepE2, trE, reps=6, passes=3)
    out["era5_keff_lwa_table_reuse_sps"] = round(BE / per, 1)

    # year of daily PV end-to-end through the batch runner (incl. host IO)
    from xcontour_tpu.runner import run_batched
    year = (vor[None] * (1 + 1e-3 * rng.standard_normal((365, 1, 1)))
            ).astype(np.float32)

    def stepY(t):
        o = keff_lwa_pipeline(t, grid, N=121, increase=True, lt=True,
                              lmin="analytic")
        return {"nkeff": o["nkeff"], "Yeq": o["Yeq"]}
    jstep = jax.jit(stepY)
    r = run_batched(jstep, year[:32], batch=32, log=lambda s: None)  # warm
    t0 = time.perf_counter()
    r = run_batched(jstep, year, batch=32, log=lambda s: None)
    dt = time.perf_counter() - t0
    assert r["nkeff"].shape == (365, 121)
    out["year_pv_s"] = round(dt, 2)
    out["year_pv_sps"] = round(365 / dt, 1)

    # isentropic Keff with PER-LEVEL contour bins (the 3-D atmosphere config,
    # reference notebooks/1.Keff_atmos.ipynb cells 0-4) — the case the
    # reference's xhistogram engine cannot bin per level (core.py:1259-1294)
    # and must route through the memory-hungry broadcast path; here the bins
    # are a vmapped batch axis
    pv, latP = workload_pv_fixture()
    gridP = host_latlon_grid(latP, np.arange(0, 360, 360 / pv.shape[-1]))
    trP = jnp.asarray(pv, jnp.float32)

    def depP(t):
        o = keff_lwa_pipeline(t, gridP, N=121, increase=True, lt=True,
                              lmin="analytic")
        # the dependency must consume EVERY output family or XLA dead-code
        # eliminates the stage (an lwa-free dep once measured 37k "snap/s")
        return (o["lwa"] + o["nkeff"].sum(-1)[:, None, None]
                + o["Yeq"].sum(-1)[:, None, None])
    per = _kernel_time_best(depP, trP, inner_lo=1, inner_hi=5, reps=6)
    out["keff_atmos_3d_perlevel_sps"] = round(pv.shape[0] / per, 1)

    # contour lengths at the two reference contour counts.  These are
    # sub-millisecond per call, so the plain outer slope drowns in the
    # ~30 ms tunnel round-trip jitter (a contaminated run once rounded to
    # 0.0, another to 0.003 ms for a 0.05 ms workload); min-over-passes
    # chained timing with long chains (inner_hi=10) and reps=40 puts the
    # work signal 1-2 orders above the host jitter.
    B = 8
    tr = jnp.asarray(vor[None] * (1 + 1e-4 * rng.standard_normal((B, 1, 1))),
                     jnp.float32)
    for n in (121, 401):
        # _kernel_time wraps as x + 1e-30*fn(x): return the raw dependency
        # term (pre-scaled deps would underflow to 1e-60 and break chaining)
        def depC(t, n=n):
            o = clength_pipeline(t, grid, N=n, increase=True, lt=True)
            return (o["lengths"].sum(-1)[:, None, None]
                    + o["cmGrd"].sum(-1)[:, None, None]
                    + o["Leq2"].sum(-1)[:, None, None])
        per = _kernel_time_best(depC, tr, inner_lo=2, inner_hi=10, reps=40)
        out[f"clength_N{n}_ms_per_snap"] = round(per / B * 1e3, 3)

    # fractal ladder, strides 1..32 with box counting
    BF = 8

    def depF(t):
        o = fractal_pipeline(t, grid, N=121, strides=(1, 2, 4, 8, 16, 32),
                             increase=True, lt=True)
        return (o["D"].sum(-1)[:, None, None]
                + o["bclens"].sum((-2, -1))[:, None, None])
    per = _kernel_time_best(depF, tr[:BF], inner_lo=2, inner_hi=10, reps=40)
    out["fractal_s1to32_ms_per_snap"] = round(per / BF * 1e3, 3)

    # local (windowed) lengths, the reference's 101-window/stride-10 config
    v32 = jnp.asarray(vor, jnp.float32)

    def depL(t):
        L, oy, ox = local_contour_lengths(t, grid.ydef, grid.xdef,
                                          window=101, stride=10, latlon=True)
        return jnp.nansum(L)
    per = _kernel_time_best(depL, v32, inner_lo=2, inner_hi=10, reps=24)
    out["local_length_w101_s10_ms_per_snap"] = round(per * 1e3, 3)
    return out


def workload_pv_fixture(nlev=16, nlat=256, nlon=512):
    """Synthesized isentropic-PV stack (level, lat, lon) — the schema of the
    reference's missing Data/PV.nc blob (SURVEY.md §2.3)."""
    from xcontour_tpu.utils import synth
    variables, _ = synth.synth_pv(nlev=nlev, nlat=nlat, nlon=nlon)
    return (np.asarray(variables["pv"], np.float32),
            np.asarray(variables["latitude"], np.float64))


class _LazyEra5Archive:
    """Procedural ERA5-scale snapshot archive: (T, 721, 1440) f32, generated
    chunk-by-chunk so neither host RAM nor device HBM ever holds it."""

    def __init__(self, T, base, seed=7):
        self.shape = (T,) + base.shape
        self._base = base.astype(np.float32)
        self._seed = seed

    def __getitem__(self, sl):
        idx = np.arange(*sl.indices(self.shape[0]))
        rng = np.random.default_rng(self._seed)
        coef = (1.0 + 1e-3 * np.sin(0.1 * idx)).astype(np.float32)
        chunk = self._base[None] * coef[:, None, None]
        chunk += 2e-6 * rng.standard_normal(self._base.shape).astype(np.float32)
        return chunk


def out_of_core(n_snap=4224):
    """Stream an archive larger than the 16 GiB HBM through run_batched:
    4224 x 721 x 1440 f32 = 16.3 GiB of input, chunked host->device with
    overlapped transfers, small per-chunk outputs fetched (the dask
    out-of-core role, reference core.py:685, tests/test_dask.py).

    In this image host->device moves through a remote tunnel at ~16 MB/s, so
    the full archive takes ~18 min wall — streaming is tunnel-bound, not
    design-bound (device compute for the same snapshots is ~35 s).  The
    default bench run therefore streams a 2.5 GiB sample live and attaches
    the recorded full-archive run (BENCH_OOC_FULL.json, produced by running
    this function with n_snap=4224; set BENCH_OOC_SNAPS=4224 to redo it
    live)."""
    import jax
    import jax.numpy as jnp
    from xcontour_tpu.pipeline import keff_lwa_pipeline
    from xcontour_tpu.runner import run_batched

    NyE, NxE = 721, 1440
    latE = np.linspace(-90, 90, NyE)
    lonE = np.arange(0, 360, 0.25)
    gridE = host_latlon_grid(latE, lonE)
    base = (2e-4 * np.sin(np.deg2rad(latE))[:, None]
            + 4e-5 * np.sin(5 * np.deg2rad(lonE))[None, :]).astype(np.float32)
    arch = _LazyEra5Archive(n_snap, base)
    gib = n_snap * NyE * NxE * 4 / 2 ** 30

    def step(t):
        o = keff_lwa_pipeline(t, gridE, N=121, increase=True, lt=True,
                              lmin="analytic")
        return {"nkeff": o["nkeff"], "Yeq": o["Yeq"],
                "lwa_zm": jnp.nanmean(o["lwa"], axis=-1)}
    jstep = jax.jit(step)
    run_batched(jstep, _LazyEra5Archive(64, base), batch=32,
                log=lambda s: None)                       # warm compile
    t0 = time.perf_counter()
    out = run_batched(jstep, arch, batch=32, log=lambda s: None)
    dt = time.perf_counter() - t0
    assert out["nkeff"].shape == (n_snap, 121)
    assert np.isfinite(out["nkeff"][:: n_snap // 7]).any()

    # device-compute-only rate for the SAME step at the same shape: the gap
    # between this and the streaming sps is pure wire/IO — the number that
    # tells a pod deployment (local host DRAM) what to expect
    resident = jnp.asarray(_LazyEra5Archive(32, base)[0:32], jnp.float32)

    def dep(t):
        o = step(t)
        return t + 1e-30 * (o["lwa_zm"].sum(-1)[:, None, None]
                            + o["nkeff"].sum(-1)[:, None, None]
                            + o["Yeq"].sum(-1)[:, None, None])
    # jit the whole chained step: the unjitted form dispatches ~10 eager
    # glue ops per rep through the remote runtime — per-call overhead the
    # slope cannot cancel (measured ~20% understatement vs the jitted
    # pipeline at the same shape)
    per = device_time(jax.jit(dep), resident, reps=6, passes=3)
    device_compute_sps = 32 / per

    # the one lever this tunnel-bound path leaves: halve the wire format
    # (runner transfer_dtype).  The tunnel's rate drifts 5-43 MB/s on a
    # minutes timescale (tools/transfer_probe.py), so a speedup ratio taken
    # from two separate long runs measures the WINDOW, not the wire format
    # (observed 0.63x..2.4x for the same code across runs).  Interleave
    # short f32/f16 rounds instead: each round pairs the formats back to
    # back, and the pooled ratio cancels the drift.
    # 3 chunks per round: single-chunk rounds measure only fixed costs (no
    # transfer/compute overlap, the host f16 cast not yet hidden by the
    # prefetch thread) and in a fast-tunnel window those dominate
    n16 = min(96, n_snap)
    rounds, t32s, t16s = 2, [], []
    o16 = None
    for _ in range(rounds):
        t0 = time.perf_counter()
        _ = run_batched(jstep, _LazyEra5Archive(n16, base), batch=32,
                        log=lambda s: None)
        t32s.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        o16 = run_batched(jstep, _LazyEra5Archive(n16, base), batch=32,
                          log=lambda s: None, transfer_dtype=np.float16)
        t16s.append(time.perf_counter() - t0)
    dt16 = sum(t16s)
    ya, yb = out["Yeq"][:n16], o16["Yeq"]
    fin = np.isfinite(ya) & np.isfinite(yb)
    yeq_max_deg = float(np.abs(ya[fin] - yb[fin]).max())
    la, lb = out["lwa_zm"][:n16], o16["lwa_zm"]
    lfin = np.isfinite(la) & np.isfinite(lb)
    lwa_rel = float(np.abs(la[lfin] - lb[lfin]).max()
                    / max(np.abs(la[lfin]).max(), 1e-30))
    return dict(snapshots=n_snap, input_gib=round(gib, 2),
                wall_s=round(dt, 1), sps=round(n_snap / dt, 1),
                device_compute_sps=round(device_compute_sps, 1),
                f16_transfer=dict(
                    snapshots=rounds * n16,
                    sps=round(rounds * n16 / dt16, 1),
                    speedup=round(sum(t32s) / dt16, 2),
                    round_sps_f32=[round(n16 / t, 1) for t in t32s],
                    round_sps_f16=[round(n16 / t, 1) for t in t16s],
                    yeq_max_err_deg=yeq_max_deg,
                    lwa_zonal_mean_max_rel_err=lwa_rel,
                    note="interleaved f32/f16 rounds on the same archive "
                         "slice (speedup = pooled t32/t16, drift-cancelling"
                         "); wire ships the f16 bits as a u16 view, device "
                         "bitcasts and upcasts to f32 before compute; "
                         "errors are INPUT-rounding propagation vs the f32 "
                         "stream, opt-in via runner transfer_dtype / CLI "
                         "--transfer"),
                note="721x1440 f32 archive streamed in 32-snapshot chunks "
                     "with overlapped transfers; outputs fetched per chunk; "
                     "rate is tunnel-bound in this image (~16 MB/s "
                     "host->device)")


def out_of_core_section():
    n = int(os.environ.get("BENCH_OOC_SNAPS", "320"))
    sec = {"live_sample": out_of_core(n_snap=n)}
    full = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "BENCH_OOC_FULL.json")
    if os.path.exists(full):
        with open(full) as f:
            sec["full_archive_recorded"] = json.load(f)
    return sec


def _init_devices(timeout_s: float):
    """``jax.devices()`` behind a watchdog.  This image's remote TPU runtime
    can HANG (not error) when the tunnel or the Mosaic compile service is
    down — measured 45+ min of silence followed by UNAVAILABLE.  A hung
    bench means the driver captures NO artifact at all, so fail fast with a
    PARSEABLE error line instead and exit 2."""
    import threading
    box = {}

    def probe():
        try:
            import jax
            box["devices"] = [str(d) for d in jax.devices()]
        except Exception as e:  # noqa: BLE001 — report any init failure
            box["error"] = repr(e)

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(timeout_s)
    if "devices" in box:
        return box["devices"]
    err = box.get("error",
                  f"jax device init did not complete within {timeout_s:.0f}s "
                  "(remote TPU tunnel hang)")
    print(json.dumps({
        "metric": METRIC,
        "value": None, "unit": "snapshots/sec", "vs_baseline": None,
        "error": err}))
    sys.stdout.flush()
    os._exit(2)


def main(argv=None):
    """Print ONE compact (< ~1.5 kB) JSON line — headline + baselines first,
    then per-kernel pct_roofline and the tall-grid crossover check — and
    write the full detail tree (op-model formulas, ceilings, workload matrix,
    out-of-core run, timing methodology) to BENCH_DETAILS.json next to this
    file.  ``--quick`` (or BENCH_QUICK=1) runs headline + kernels + baselines
    only, < 3 min, so a driver/judge re-run completes inside a timeout.

    Failure contract (VERDICT r4 #1): _init_devices fails fast with a
    parseable error line on init hangs; everything AFTER it runs under the
    same contract — any exception emits one parseable JSON line with
    ``value: null`` and an ``error`` field, exit 1 — and transient backend
    faults (FAILED_PRECONDITION/UNAVAILABLE, the tunnel's outage signature)
    are retried with geometric backoff before giving up."""
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    default=os.environ.get("BENCH_QUICK", "") not in ("", "0"))
    ap.add_argument("--device-timeout", type=float,
                    default=float(os.environ.get("BENCH_DEVICE_TIMEOUT",
                                                 "240")))
    args = ap.parse_args(argv)

    _init_devices(args.device_timeout)
    try:
        return _run(args)
    except Exception as e:  # noqa: BLE001 — ANY failure must still emit a
        # parseable one-line artifact for the driver (round 4's capture was
        # an uncaught traceback -> rc=1 with parsed=null)
        print(json.dumps({
            "metric": METRIC, "value": None, "unit": "snapshots/sec",
            "vs_baseline": None, "error": repr(e)[:800]}))
        sys.stdout.flush()
        return 1


def _run(args):
    lat, lon, vor = _retry("load", _load)
    n_cpu = int(os.environ.get("BENCH_CPU_SNAPS", "10"))
    batch = int(os.environ.get("BENCH_BATCH", "32"))

    sps = _retry("headline", lambda: headline(lat, lon, vor, batch=batch))
    # the <=1e-6-faithful configuration (BASELINE.json north star tolerance):
    # reference-exact f32 summation semantics via the pairwise 'dense' path,
    # pinned as its own cross-round series next to the default-path headline.
    # Full-mode only: on a cold cache it costs a second remote Mosaic
    # compile (~1-2 min), which would break --quick's <3 min re-run contract
    sps_dense = None if args.quick else _retry(
        "headline_dense",
        lambda: headline(lat, lon, vor, batch=batch, lwa_method="dense"))
    kernels = _retry("kernels",
                     lambda: kernel_rooflines(lat, lon, vor, batch=batch))
    adjoint = _retry("adjoint", lambda: adjoint_section(
        lat, lon, vor, batch=batch, era5=not args.quick))
    tall = workloads = ooc = None
    if not args.quick:
        tall = _retry("lwa_tall", lwa_tall)
        workloads = _retry("workloads",
                           lambda: workload_matrix(lat, lon, vor))
        ooc = _retry("out_of_core", out_of_core_section)

    oracle = cpu_oracle_sps(lat, lon, vor, n_snap=n_cpu)
    fast = cpu_numpy_fast_sps(lat, lon, vor, n_snap=n_cpu)

    # a quick run must not destroy the expensive full-run sections already
    # on disk — carry them over, marked, instead of nulling them out
    detail_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BENCH_DETAILS.json")
    carried = []
    if args.quick and os.path.exists(detail_path):
        try:
            with open(detail_path) as f:
                prev = json.load(f)
        except (OSError, ValueError):
            prev = {}
        for key, cur in (("lwa_tall", tall), ("workloads", workloads),
                         ("out_of_core", ooc)):
            if cur is None and prev.get(key) is not None:
                if key == "lwa_tall":
                    tall = prev[key]
                elif key == "workloads":
                    workloads = prev[key]
                else:
                    ooc = prev[key]
                carried.append(key)

    details = {
        "kernels": kernels,
        "adjoint": adjoint,
        "lwa_tall": tall,
        "workloads": workloads,
        "out_of_core": ooc,
        "baseline_note": ("xarray/dask/xhistogram are not installable in "
                          "this image; both baselines are pure NumPy on this "
                          "host — the literal reference stack adds overhead "
                          "on top, so the speedups are conservative lower "
                          "bounds"),
        "method": ("fetch-forced dependency-chained slope timing "
                   "(block_until_ready does not synchronize through this "
                   "remote runtime; r01 numbers measured enqueue rate). "
                   "Calibration: 676 GB/s elementwise (83% HBM spec), "
                   "171 Tflop/s f32 matmul."),
        "mode": "quick" if args.quick else "full",
    }
    if carried:
        details["carried_from_previous_run"] = carried
        details["mode"] = "quick (carried: " + ",".join(carried) + ")"
    with open(detail_path, "w") as f:
        json.dump(details, f, indent=1)

    compact_kernels = {
        k: {"ms": v["ms"], "pct_roofline": v["pct_roofline"],
            "pct_meas": v["pct_of_measured_ceiling"],
            **({"pct_struct": v["pct_of_structure_ceiling"]}
               if "pct_of_structure_ceiling" in v else {})}
        for k, v in kernels.items() if k not in ("ceilings", "contention")}
    line = {
        "metric": METRIC,
        "value": round(sps, 1),
        "unit": "snapshots/sec",
        "vs_baseline": round(sps / oracle, 2),
        **({"headline_dense_sps": round(sps_dense, 1)}
           if sps_dense is not None else {}),
        "baselines": {"oracle_f64_sps": round(oracle, 3),
                      "numpy_fast_f32_sps": round(fast, 3),
                      "vs_numpy_fast": round(sps / fast, 2)},
        "contention": kernels["contention"],
        "kernels": compact_kernels,
        "mode": details["mode"],
        "details": "BENCH_DETAILS.json",
    }
    # pinned-denominator ratios: the live oracle reading swings ~3x with
    # host load; the committed quiet-window medians make the cross-round
    # speedup series comparable (VERDICT r4 #5)
    if PINNED_ORACLE_SPS:
        line["vs_baseline_pinned"] = round(sps / PINNED_ORACLE_SPS, 2)
        line["baselines"]["pinned_oracle_f64_sps"] = PINNED_ORACLE_SPS
    if PINNED_NUMPY_FAST_SPS:
        line["baselines"]["pinned_numpy_fast_f32_sps"] = PINNED_NUMPY_FAST_SPS
        line["baselines"]["vs_numpy_fast_pinned"] = round(
            sps / PINNED_NUMPY_FAST_SPS, 2)
    if tall is not None:
        line["lwa_tall"] = {"ny": tall["ny"], "fast_ms": tall["fast_ms"],
                            "lin_ms": tall["lin_ms"],
                            "auto": tall["auto_resolves_to"],
                            "fast_wins": tall["fast_wins"]}
    if workloads is not None:
        line["era5_sps"] = workloads["era5_keff_lwa_sps"]
        line["year_pv_s"] = workloads["year_pv_s"]
    line["adjoint_sps"] = adjoint["grad_sps"]
    # append-only run ledger: one row per bench invocation, committed to
    # git, so cross-round headline claims are falsifiable — a regression
    # shows a dropped headline at UNCHANGED contention index; a congested
    # window drops both together (round-3 verdict item 1)
    hist_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "BENCH_HISTORY.jsonl")
    hist_row = {
        "ts": time.strftime("%Y-%m-%dT%H:%M:%S%z"),
        "headline_sps": round(sps, 1),
        **({"headline_dense_sps": round(sps_dense, 1)}
           if sps_dense is not None else {}),
        "vs_baseline_pinned": round(sps / PINNED_ORACLE_SPS, 2)
        if PINNED_ORACLE_SPS else None,
        "contention": kernels["contention"],
        "kernel_ms": {k: v["ms"] for k, v in compact_kernels.items()},
        "pct_meas": {k: v["pct_meas"] for k, v in compact_kernels.items()},
        "adjoint_sps": adjoint["grad_sps"],
        "oracle_sps": round(oracle, 3),
        "mode": details["mode"], "batch": batch,
    }
    with open(hist_path, "a") as f:
        f.write(json.dumps(hist_row) + "\n")

    out = json.dumps(line)
    assert len(out) < 1600, f"compact line grew to {len(out)} bytes"
    print(out)


if __name__ == "__main__":
    sys.exit(main())
