"""Randomized end-to-end fuzz of the batch CLI + streaming layer.

Each seed synthesizes a small netCDF archive with hostile *presentation* —
shuffled lead-dim orders, descending latitude, custom dim names, NaN
topography, per-variable attributes, classic-nc3 vs HDF5-nc4 encoding —
drives ``cli.main`` end-to-end (lazy open, chunk streaming, checkpoint/
resume with randomly deleted chunks emulating a mid-archive kill), and
compares the written output element-for-element against a direct call of
the corresponding jitted pipeline on the canonicalized in-memory array.

    python tools/fuzz_cli.py [seconds=600] [start_seed=0]

Prints one line per FAILING seed and a summary; exit 1 on any failure.
(The pipeline-vs-oracle analogue is tools/fuzz_campaign.py.)
"""

from __future__ import annotations

import glob
import os
import shutil
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax

jax.config.update("jax_platforms", "cpu")  # mirror the production CLI: f32

import jax.numpy as jnp

from xcontour_tpu import cli, pipeline
from xcontour_tpu.grid import from_latlon
from xcontour_tpu.utils.ncio import (load_dataset, save_dataset,
                                     save_dataset_nc3)

_LAT_NAMES = ["latitude", "lat", "LAT", "ygrid"]   # ygrid needs --dims
_LON_NAMES = ["longitude", "lon", "LON", "xgrid"]  # xgrid needs --dims
_AUTO = {"latitude", "lat", "LAT", "longitude", "lon", "LON"}


def _field(rng, style, T, Ny, Nx, lat):
    base = np.sin(np.deg2rad(lat))[None, :, None]
    if style == 0:
        f = base + 0.2 * rng.normal(size=(T, Ny, Nx))
    elif style == 1:
        f = np.cumsum(rng.normal(size=(T, Ny, Nx)), axis=1)
    elif style == 2:
        f = rng.integers(0, 3, size=(T, Ny, Nx)).astype(np.float64)
        f += 1e-3 * rng.normal(size=(T, Ny, Nx))
    else:
        f = 1e3 + base + rng.normal(size=(T, Ny, Nx))
    return (f * rng.uniform(0.1, 4.0)).astype(np.float32)


def _cmp(fails, name, got, want, rtol=5e-5):
    """NaN/inf patterns must match exactly; finite values within an
    ULP-scale band.  Bitwise equality is the wrong contract here: XLA tiles
    f32 reductions differently for different compiled batch shapes, so a
    chunk-shaped CLI run and a full-batch direct call legitimately differ in
    the last ulps (verified: the bare pipeline on ONE snapshot vs the same
    snapshot repeated 3x differs in Leq2 with rows self-consistent —
    compiler rounding, not a streaming bug).  Matched-shape bitwise parity
    is pinned separately in tests/test_cli.py."""
    got = np.asarray(got)
    want = np.asarray(want)
    if got.shape != want.shape:
        fails.append(f"{name}: shape {got.shape} vs {want.shape}")
        return
    g = got.reshape(-1).astype(np.float64)
    w = want.reshape(-1).astype(np.float64)
    pat = (np.isnan(g) == np.isnan(w)) & \
        ((np.isinf(g) & (g == w)) | ~np.isinf(g)) & \
        ((np.isinf(w) & (g == w)) | ~np.isinf(w))
    scale = np.nanmax(np.abs(w[np.isfinite(w)])) if np.isfinite(w).any() \
        else 1.0
    both = np.isfinite(g) & np.isfinite(w)
    err = np.zeros_like(g)
    err[both] = np.abs(g[both] - w[both])
    bad = ~pat | (err > rtol * max(scale, 1e-300))
    if bad.any():
        i = int(np.argmax(bad))
        fails.append(f"{name}: {int(bad.sum())}/{g.size} mismatch "
                     f"(tol {rtol * scale:.3e}), first at {i}: "
                     f"{g[i]!r} vs {w[i]!r}")


def one(seed: int, workdir: str) -> list:
    rng = np.random.default_rng(seed)
    fails = []

    # ---- synthesize the archive ------------------------------------------
    Ny = 4 * int(rng.integers(3, 9))            # stride-divisible
    Nx = 4 * int(rng.integers(3, 11))
    lat0 = float(rng.uniform(-88, -20))
    lat1 = float(rng.uniform(20, 88))
    lat = np.linspace(lat0, lat1, Ny)
    lon = np.arange(Nx) * (360.0 / Nx) if rng.integers(0, 2) \
        else np.linspace(0.0, float(rng.uniform(90, 350)), Nx)

    lat_n = _LAT_NAMES[int(rng.integers(0, len(_LAT_NAMES)))]
    lon_n = _LON_NAMES[int(rng.integers(0, len(_LON_NAMES)))]
    need_dims = lat_n not in _AUTO or lon_n not in _AUTO

    layout = ((), ("time",), ("time", "lev"), ("lev", "time"))[
        int(rng.integers(0, 4))]
    sizes = {"time": int(rng.integers(1, 7)), "lev": int(rng.integers(1, 4))}
    lead_shape = tuple(sizes[d] for d in layout)
    Tall = int(np.prod(lead_shape)) if lead_shape else 1

    q = _field(rng, int(rng.integers(0, 4)), Tall, Ny, Nx, lat)
    q = q.reshape(lead_shape + (Ny, Nx))

    # topography: NaN blob (mask-from-nan) or a mask variable, or nothing
    mask_mode = int(rng.integers(0, 3))
    maskC = None
    if mask_mode == 1:                            # NaN blob in every snap
        blob = np.zeros((Ny, Nx), bool)
        cy, cx = int(rng.integers(0, Ny)), int(rng.integers(0, Nx))
        ry = int(rng.integers(1, max(2, Ny // 4)))
        rx = int(rng.integers(1, max(2, Nx // 4)))
        yy, xx = np.ogrid[:Ny, :Nx]
        blob[((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2 < 1.0] = True
        if (~blob).sum() < 8:
            blob[:] = False
        q[..., blob] = np.nan
    elif mask_mode == 2:
        maskC = np.ones((Ny, Nx), np.float32)
        maskC[Ny // 4: Ny // 2, Nx // 5: Nx // 2] = 0.0

    # sigma scale variable over a random order-preserving dim subset
    scale_n, sigma = None, None
    if rng.integers(0, 3) == 0:
        cand_dims = [d for d in (layout + (lat_n,)) if rng.integers(0, 2)]
        if cand_dims:
            scale_n = "sigma"
            sshape = tuple(sizes.get(d, Ny) for d in cand_dims)
            sigma = rng.uniform(0.5, 1.5, size=sshape).astype(np.float32)

    desc = bool(rng.integers(0, 2))               # descending-latitude file
    lat_file = lat[::-1].copy() if desc else lat
    q_file = q[..., ::-1, :].copy() if desc else q
    mask_file = maskC[::-1].copy() if (desc and maskC is not None) else maskC
    sig_file = sigma
    if desc and sigma is not None and lat_n in (scale_n and cand_dims or ()):
        ax = cand_dims.index(lat_n)
        sig_file = np.flip(sigma, axis=ax).copy()

    variables = {"q": q_file}
    dims = {"q": layout + (lat_n, lon_n)}
    coords = {lat_n: lat_file, lon_n: lon}
    for d in layout:
        coords[d] = np.arange(sizes[d], dtype=np.float32)
    if mask_file is not None:
        variables["maskC"] = mask_file
        dims["maskC"] = (lat_n, lon_n)
    if sig_file is not None:
        variables["sigma"] = sig_file
        dims["sigma"] = tuple(cand_dims)
    nc3 = bool(rng.integers(0, 2))
    attrs = {}
    if rng.integers(0, 2):
        val = b"K" if nc3 else "K"
        attrs = {"q": {"units": val}, lat_n: {"axis": b"Y" if nc3 else "Y"}}

    path = os.path.join(workdir, "in.nc")
    writer = save_dataset_nc3 if nc3 else save_dataset
    writer(path, variables, dims, coords=coords, attrs=attrs)

    # ---- choose a command + flags ----------------------------------------
    cmd = ("keff", "lwa", "keff-lwa", "clength", "fractal")[
        int(rng.integers(0, 5))]
    N = int(rng.integers(5, 32))
    decrease = bool(rng.integers(0, 2))
    gt = bool(rng.integers(0, 2))
    batch = int(rng.integers(1, Tall + 3))
    out = os.path.join(workdir, "out.nc")
    argv = [cmd, path, "--var", "q", "-N", str(N), "--batch", str(batch),
            "--out", out]
    if need_dims:
        argv += ["--dims", f"X={lon_n},Y={lat_n}"]
    if decrease:
        argv += ["--decrease"]
    if gt:
        argv += ["--gt"]
    if mask_mode == 1 and rng.integers(0, 2):
        argv += ["--mask-from-nan"]
        mask_used = np.isfinite(q).all(axis=tuple(range(q.ndim - 2)))
    elif mask_mode == 2:
        argv += ["--mask-var", "maskC"]
        mask_used = maskC != 0
    else:
        mask_used = None
    if scale_n is not None:
        argv += ["--scale-var", "sigma"]
    isel = {}
    if layout and rng.integers(0, 2):
        d = layout[int(rng.integers(0, len(layout)))]
        isel[d] = int(rng.integers(-sizes[d], sizes[d]))
        argv += ["--isel", f"{d}={isel[d]}"]
    if rng.integers(0, 2):
        argv += ["--format", "nc3"]
    transfer = None
    if rng.integers(0, 4) == 0:   # reduced-precision wire format: the CLI
        # rounds each chunk AFTER the lazy-view transforms, so the expected
        # value is the composed array rounded once (bit-identical contract)
        transfer = ("f16", "bf16")[int(rng.integers(0, 2))]
        argv += ["--transfer", transfer]

    lmin = ("analytic", "dxF", "frac")[int(rng.integers(0, 3))]
    interp_eq = False
    lwa_kw = {}
    if cmd in ("keff", "keff-lwa"):
        argv += ["--lmin", lmin]
        if rng.integers(0, 2):
            argv += ["--interp-eq"]
            interp_eq = True
    if cmd == "keff" and rng.integers(0, 2):
        argv += ["--no-hist"]
        hist = False
    else:
        hist = True
    if cmd == "lwa":
        part_cli = ("all", "upper", "lower", "cyclone", "anticyclone")[
            int(rng.integers(0, 5))]
        argv += ["--part", part_cli]
        lwa_kw["part"] = {"cyclone": "upper",
                          "anticyclone": "lower"}.get(part_cli, part_cli)
    if cmd in ("lwa", "keff-lwa"):
        m = ("auto", "lin", "dense")[int(rng.integers(0, 3))]
        argv += ["--lwa-method", m]
        lwa_kw["lwa_method"] = m
        metric = ("dA", "dy")[int(rng.integers(0, 2))]
        argv += ["--metric", metric]
        lwa_kw["metric"] = metric
        if m == "lin" and lwa_kw.get("part", "all") != "all":
            # invalid by contract: the CLI must REJECT it cleanly (fuzz
            # finding: it used to crash with a trace-time ValueError)
            try:
                rc = cli.main(list(argv))
            except SystemExit as e:
                if "lwa-method lin" in str(e):
                    return []
                return [f"wrong rejection for lin+part: {e}"]
            return [f"lin+part={lwa_kw['part']} accepted (rc={rc}); "
                    "expected a clean SystemExit"]
    with_lwa2 = cmd == "keff-lwa" and bool(rng.integers(0, 2))
    if with_lwa2:
        argv += ["--with-lwa2"]
    if cmd == "fractal":
        argv += ["--strides", "1,2,4"]

    # checkpoint/resume with a random mid-archive "kill"
    stem = None
    if rng.integers(0, 2):
        stem = os.path.join(workdir, "ck")
        argv += ["--stem", stem]

    rc = cli.main(list(argv))
    if rc != 0:
        return [f"cli rc={rc} argv={argv}"]

    if stem is not None:
        # emulate a killed run: drop a random subset of chunks + the output,
        # rerun the identical argv (same fingerprint -> resume)
        chunks = sorted(glob.glob(stem + "_ck*.npz"))
        for c in chunks:
            if rng.integers(0, 2):
                os.remove(c)
        os.remove(out)
        rc = cli.main(list(argv))
        if rc != 0:
            return [f"resume rc={rc} argv={argv}"]

    ds = load_dataset(out)

    # ---- canonical expected ----------------------------------------------
    arr = np.asarray(q_file)
    if sig_file is not None:
        shp = [sizes.get(d, Ny) if d in cand_dims else 1
               for d in layout + (lat_n, lon_n)]
        arr = arr * np.asarray(sig_file).reshape(shp)
    if desc:
        arr = arr[..., ::-1, :]
    for d, i in isel.items():
        arr = np.take(arr, i, axis=layout.index(d))
    exp_lead = tuple(sizes[d] for d in layout if d not in isel)
    arr = arr.reshape((-1, Ny, Nx)).astype(np.float32)
    if mask_used is not None:
        arr = np.where(mask_used[None], arr, np.nan)
    if transfer is not None:      # same host cast the runner applies
        import ml_dtypes
        wdt = np.float16 if transfer == "f16" else ml_dtypes.bfloat16
        arr = arr.astype(wdt).astype(np.float32)
    mask_f = None if mask_used is None \
        else np.asarray(mask_used, np.float32)

    grid = from_latlon(lat, lon, mask=mask_f, dim_names=(lat_n, lon_n),
                       dtype=jnp.float32)
    qj = jnp.asarray(arr)
    inc, lt = not decrease, not gt
    pre_y = jnp.asarray(np.asarray(grid.ydef)) if interp_eq else None

    def shaped(a):
        a = np.asarray(a)
        # the CLI labels a lead-dim-less archive with a singleton lead dim
        return a.reshape((exp_lead or (1,)) + a.shape[1:])

    if cmd == "keff":
        ref = pipeline.keff_pipeline(qj, grid, N=N, increase=inc, lt=lt,
                                     hist=hist, lmin=lmin, pre_y=pre_y)
        _cmp(fails, "nkeff", ds["nkeff"], shaped(ref["origin"]["nkeff"]))
        _cmp(fails, "Yeq", ds["Yeq"], shaped(ref["origin"]["Yeq"]))
        if interp_eq:
            _cmp(fails, "nkeff_at", ds["nkeff_at"],
                 shaped(ref["interp"]["nkeff"]))
    elif cmd == "lwa":
        ref = pipeline.lwa_pipeline(qj, grid, N=N, increase=inc, lt=lt,
                                    **lwa_kw)
        _cmp(fails, "lwa", ds["lwa"], shaped(ref["lwa"]))
    elif cmd == "keff-lwa":
        ref = pipeline.keff_lwa_pipeline(qj, grid, N=N, increase=inc,
                                         lt=lt, lmin=lmin, pre_y=pre_y,
                                         with_lwa2=with_lwa2, **lwa_kw)
        _cmp(fails, "nkeff", ds["nkeff"], shaped(ref["nkeff"]))
        _cmp(fails, "lwa", ds["lwa"], shaped(ref["lwa"]))
        if with_lwa2:
            _cmp(fails, "lwa2", ds["lwa2"], shaped(ref["lwa2"]))
    elif cmd == "clength":
        ref = pipeline.clength_pipeline(qj, grid, N=N, increase=inc, lt=lt)
        _cmp(fails, "lengths", ds["lengths"], shaped(ref["lengths"]))
    else:
        ref = pipeline.fractal_pipeline(qj, grid, N=N, strides=(1, 2, 4),
                                        increase=inc, lt=lt)
        _cmp(fails, "D", ds["D"], shaped(ref["D"]))

    if fails:
        fails = [f"{m} [argv={' '.join(argv)}]" for m in fails]
    return fails


def main():
    budget = float(sys.argv[1]) if len(sys.argv) > 1 else 600.0
    seed0 = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    t0 = time.time()
    seed, nfail = seed0, 0
    while time.time() - t0 < budget:
        if (seed - seed0) % 20 == 19:
            jax.clear_caches()     # same jit-cache growth guard as
            #                        fuzz_campaign.py (this image's CPU
            #                        client segfaults past ~1000 programs)
        workdir = tempfile.mkdtemp(prefix="fuzzcli_")
        try:
            fails = one(seed, workdir)
        except SystemExit as e:    # an argparse/validation crash on a
            #                        config the fuzzer built to be VALID
            fails = [f"SystemExit: {e}"]
        except Exception as e:  # noqa: BLE001 — a crash is a finding
            fails = [f"CRASH {type(e).__name__}: {str(e)[:200]}"]
        finally:
            shutil.rmtree(workdir, ignore_errors=True)
        if fails:
            nfail += 1
            for msg in fails:
                print(f"FAIL seed {seed}: {msg}", flush=True)
        seed += 1
    n = seed - seed0
    print(f"cli fuzz campaign: {n} configs in {time.time() - t0:.0f}s, "
          f"{nfail} failing seeds")
    return 1 if nfail else 0


if __name__ == "__main__":
    sys.exit(main())
