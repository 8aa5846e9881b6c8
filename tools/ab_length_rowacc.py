#!/usr/bin/env python
"""Interleaved A/B: length kernel one-hot scalar accumulation vs row_acc
(per-level sublane-only reduce into a (levels, NxC) scratch row, lanes
folded once per batch element).  Min-pooled interleaved rounds per the
docs/PERF.md sub-20% A/B lesson.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np  # noqa: E402
import bench  # noqa: E402


def main():
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    bench._init_devices(240)
    import jax.numpy as jnp
    from xcontour_tpu.kernels.length_pallas import contour_lengths_pallas

    lat, lon, vor = bench._load()
    batch, N = 32, 121
    rng = np.random.default_rng(0)
    snaps = vor[None] * (1.0 + 1e-4 * rng.standard_normal((batch, 1, 1)))
    q = jnp.asarray(snaps, jnp.float32)
    lo, hi = float(np.nanmin(snaps)), float(np.nanmax(snaps))
    levels = np.linspace(lo, hi, N)[None].repeat(batch, 0).astype(np.float32)
    ydef = np.deg2rad(lat).astype(np.float32)
    xdef = np.deg2rad(lon).astype(np.float32)

    def make(ra):
        def k(x):
            r = contour_lengths_pallas(x, levels, ydef, xdef, latlon=True,
                                       row_acc=ra)
            return jnp.sum(r, axis=1)[:, None, None]
        return k

    base = np.asarray(contour_lengths_pallas(q, levels, ydef, xdef,
                                             latlon=True, row_acc=False))
    got = np.asarray(contour_lengths_pallas(q, levels, ydef, xdef,
                                            latlon=True, row_acc=True))
    rel = float(np.nanmax(np.abs(got - base)
                          / np.maximum(np.abs(base), 1e-30)))
    print(f"# parity max rel diff (summation order only): {rel:.2e}")
    assert rel < 5e-6

    times = {False: [], True: []}
    for r in range(rounds):
        for ra in (False, True):
            t = bench._kernel_time(make(ra), q, inner_lo=1, inner_hi=5,
                                   reps=4)
            times[ra].append(t * 1e3)
        print(f"# round {r + 1}: onehot={times[False][-1]:.3f}ms  "
              f"row_acc={times[True][-1]:.3f}ms", file=sys.stderr)
    print({("row_acc" if k else "onehot"): round(min(v), 4)
           for k, v in times.items()})


if __name__ == "__main__":
    main()
