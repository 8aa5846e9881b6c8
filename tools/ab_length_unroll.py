#!/usr/bin/env python
"""Interleaved A/B of the length kernel's level_unroll on the real TPU.

The structure probe puts the kernel at ~56% of a same-structure ceiling;
the suspect is the per-level full-panel reduce + one-hot RMW serialization
(fori unroll=False runs levels one at a time).  Unrolling interleaves the
independent per-level chains.  Interleaved min-pooled rounds per the
docs/PERF.md lesson: sub-20% A/B results need paired windows.

The recorded "u2 ~8% slower, u4/u8 worse" claim (length_pallas.py kernel
comment) was measured on the one-hot accumulation path, which was the
default then; row_acc=False is now passed EXPLICITLY so re-runs measure
the same path the claim names (the production default flipped to
row_acc=True afterwards — pass 1 as the second argument to probe that
path instead).

Usage: python tools/ab_length_unroll.py [rounds] [row_acc(0|1)]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np  # noqa: E402
import bench  # noqa: E402


def main():
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    row_acc = bool(int(sys.argv[2])) if len(sys.argv) > 2 else False
    bench._init_devices(240)
    import jax.numpy as jnp
    from xcontour_tpu.kernels.length_pallas import contour_lengths_pallas

    lat, lon, vor = bench._load()
    batch, N = 32, 121
    Ny, Nx = vor.shape
    rng = np.random.default_rng(0)
    snaps = vor[None] * (1.0 + 1e-4 * rng.standard_normal((batch, 1, 1)))
    q = jnp.asarray(snaps, jnp.float32)
    lo, hi = float(np.nanmin(snaps)), float(np.nanmax(snaps))
    levels = np.linspace(lo, hi, N)[None].repeat(batch, 0).astype(np.float32)
    ydef = np.deg2rad(lat).astype(np.float32)
    xdef = np.deg2rad(lon).astype(np.float32)

    def make(u):
        def k(x):
            r = contour_lengths_pallas(x, levels, ydef, xdef, latlon=True,
                                       level_unroll=u, row_acc=row_acc)
            return jnp.sum(r, axis=1)[:, None, None]
        return k

    unrolls = (1, 2, 4, 8)
    # parity first: unrolled results must be bitwise-equal (same per-level
    # arithmetic, only the loop schedule changes)
    base = np.asarray(contour_lengths_pallas(q, levels, ydef, xdef,
                                             latlon=True, row_acc=row_acc))
    for u in unrolls[1:]:
        got = np.asarray(contour_lengths_pallas(q, levels, ydef, xdef,
                                                latlon=True, level_unroll=u,
                                                row_acc=row_acc))
        np.testing.assert_array_equal(got, base, err_msg=f"unroll={u}")
    print(f"# parity: bitwise-equal across unrolls (row_acc={row_acc})")

    times = {u: [] for u in unrolls}
    for r in range(rounds):
        for u in unrolls:
            t = bench._kernel_time(make(u), q, inner_lo=1, inner_hi=5, reps=4)
            times[u].append(t * 1e3)
        print(f"# round {r + 1}: " + "  ".join(
            f"u{u}={times[u][-1]:.3f}ms" for u in unrolls), file=sys.stderr)
    print({u: round(min(v), 4) for u, v in times.items()})


if __name__ == "__main__":
    main()
