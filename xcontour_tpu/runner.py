"""Batch runner: stream large snapshot archives through a jitted pipeline.

The reference's production driver (tests/LWA.py) is a Python double loop over
time and level, writing one NetCDF at the end — no overlap, no resume.  This
runner provides the aux-subsystem plan from SURVEY.md §5:

* fixed-size batching (one compiled program reused for every chunk; a padded
  tail chunk avoids a second compilation);
* host->device transfer of chunk k+1 overlapped with compute on chunk k
  (device_put is async; the block happens only on result fetch);
* idempotent per-chunk outputs: each chunk writes `<stem>_ck{k:05d}.npz` and
  is skipped when the file already exists, giving snapshot-granular
  checkpoint/resume for free;
* structured per-chunk logging (shapes + wall time).
"""

from __future__ import annotations

import os
import time
from typing import Callable, Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp


def run_batched(step: Callable[[jax.Array], Dict[str, jax.Array]],
                snapshots: np.ndarray, batch: int = 32,
                out_stem: Optional[str] = None,
                resume: bool = True, log: Callable[[str], None] = print
                ) -> Optional[Dict[str, np.ndarray]]:
    """Run ``step`` over ``snapshots`` (T, Ny, Nx) in fixed-size batches.

    With ``out_stem`` set, results are written per chunk and already-written
    chunks are skipped (resume); returns None.  Without it, results are
    concatenated in memory and returned.
    """
    T = snapshots.shape[0]
    nchunk = -(-T // batch)
    collected: Dict[str, list] = {}

    # pre-issue the first transfer; subsequent transfers overlap compute
    def chunk_array(k):
        lo = k * batch
        hi = min(lo + batch, T)
        arr = snapshots[lo:hi]
        if hi - lo < batch:  # pad the tail so the compiled shape is reused
            pad = np.repeat(arr[-1:], batch - (hi - lo), axis=0)
            arr = np.concatenate([arr, pad], axis=0)
        return jax.device_put(jnp.asarray(arr)), hi - lo

    pending = chunk_array(0)
    for k in range(nchunk):
        dev, nvalid = pending
        if k + 1 < nchunk:
            pending = chunk_array(k + 1)

        path = f"{out_stem}_ck{k:05d}.npz" if out_stem else None
        if path and resume and os.path.exists(path):
            log(f"[runner] chunk {k + 1}/{nchunk}: exists, skipped")
            continue

        t0 = time.perf_counter()
        out = step(dev)
        out_np = {key: np.asarray(v)[:nvalid] for key, v in out.items()}
        dt = time.perf_counter() - t0
        log(f"[runner] chunk {k + 1}/{nchunk}: {nvalid} snapshots "
            f"in {dt:.3f}s ({nvalid / dt:.1f}/s)")

        if path:
            tmp = path + ".tmp.npz"
            np.savez(tmp, **out_np)
            os.replace(tmp, path)  # atomic: a chunk file is complete or absent
        else:
            for key, v in out_np.items():
                collected.setdefault(key, []).append(v)

    if out_stem:
        return None
    return {k: np.concatenate(v, axis=0) for k, v in collected.items()}


def load_chunks(out_stem: str) -> Dict[str, np.ndarray]:
    """Reassemble results written by :func:`run_batched`."""
    import glob
    files = sorted(glob.glob(f"{out_stem}_ck*.npz"))
    if not files:
        raise FileNotFoundError(f"no chunks matching {out_stem}_ck*.npz")
    parts: Dict[str, list] = {}
    for f in files:
        with np.load(f) as z:
            for k in z.files:
                parts.setdefault(k, []).append(z[k])
    return {k: np.concatenate(v, axis=0) for k, v in parts.items()}
