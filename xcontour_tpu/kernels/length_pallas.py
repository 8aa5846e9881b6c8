"""Pallas TPU kernel for traversal-free contour perimeter lengths.

The XLA formulation evaluates every (cell, level) pair densely — for zonally
banded geophysical tracers that wastes most of the transcendental work, since
a given contour level only crosses the latitude band containing it.  Here the
cell rows are split into row blocks; each (row-block, level) grid step is
guarded by a precomputed block min/max pretest (`pl.when`), so blocks the
level cannot cross cost one scalar compare.  Within an active block the cell
geometry (endpoint selection first, then at most two geodesic evaluations —
diagnostics/length.py semantics exactly) runs on VMEM-resident corner panels,
and per-level totals accumulate through a one-hot row into a VMEM scratch,
flushed once per batch element.

Cited semantics: skimage-compatible marching squares with
fully_connected='low' saddles (reference core.py:1437-1487 + utils.py:565-609
for what is being replaced).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_RB = 16  # cell rows per block (multiple of the f32 sublane width).
# Smaller blocks tighten the per-block min/max level pretest — a contour
# level crosses fewer 16-row bands than 64-row bands, so fewer dense panel
# evaluations run (measured 38 -> 20 ms on the 32x256x512 N=121 case; 8-row
# blocks lose the gain again to grid-step overhead).


def _seg_endpoints(level, v00, v01, v10, v11):
    """Case classification + endpoint selection (no transcendentals)."""
    a00 = v00 > level
    a01 = v01 > level
    a10 = v10 > level
    a11 = v11 > level

    def frac(va, vb):
        d = vb - va
        return jnp.where(d == 0, 0.0, (level - va) / jnp.where(d == 0, 1.0, d))

    ft = frac(v00, v01)
    fb = frac(v10, v11)
    fl = frac(v00, v10)
    fr = frac(v01, v11)

    iso00 = (a00 != a01) & (a00 != a10) & (a01 == a11)
    iso01 = (a01 != a00) & (a01 != a11) & (a00 == a10)
    iso10 = (a10 != a00) & (a10 != a11) & (a00 == a01)
    iso11 = (a11 != a01) & (a11 != a10) & (a01 == a00)
    horiz = (a00 == a01) & (a10 == a11) & (a00 != a10)
    verti = (a00 == a10) & (a01 == a11) & (a00 != a01)
    sad_main = a00 & a11 & ~a01 & ~a10
    sad_anti = a01 & a10 & ~a00 & ~a11
    exists1 = (iso00 | iso01 | iso10 | iso11 | horiz | verti |
               sad_main | sad_anti)
    saddle = sad_main | sad_anti
    return dict(ft=ft, fb=fb, fl=fl, fr=fr, iso00=iso00, iso01=iso01,
                iso10=iso10, iso11=iso11, horiz=horiz, verti=verti,
                sad_main=sad_main, exists1=exists1, saddle=saddle)


def _block_length(level, v00, v01, v10, v11, y0, y1, x0, x1, valid,
                  latlon: bool):
    c = _seg_endpoints(level, v00, v01, v10, v11)
    top = (y0, x0 + c["ft"] * (x1 - x0))
    bot = (y1, x0 + c["fb"] * (x1 - x0))
    lef = (y0 + c["fl"] * (y1 - y0), x0)
    rig = (y0 + c["fr"] * (y1 - y0), x1)

    def sel(cond, p, q):
        return (jnp.where(cond, p[0], q[0]), jnp.where(cond, p[1], q[1]))

    if latlon:
        def asin_small(z):
            # Mosaic has no asin lowering; per-cell haversine arguments are
            # tiny (z = sin(d/2) <= ~0.05 for cells up to ~5 deg), where the
            # odd Maclaurin series through z^7 is exact to ~1e-12 relative
            z2 = z * z
            return z * (1.0 + z2 * (1.0 / 6.0 + z2 * (3.0 / 40.0 +
                                                      z2 * (15.0 / 336.0))))

        def seglen(p, q):
            dlon = q[1] - p[1]
            dlat = q[0] - p[0]
            a = (jnp.sin(dlat * 0.5) ** 2 +
                 jnp.cos(p[0]) * jnp.cos(q[0]) * jnp.sin(dlon * 0.5) ** 2)
            return 2.0 * asin_small(jnp.sqrt(jnp.clip(a, 0.0, 1.0)))
    else:
        def seglen(p, q):
            return jnp.hypot(p[0] - q[0], p[1] - q[1])

    p1 = sel(c["horiz"], lef, sel(c["iso10"] | c["iso11"], bot, top))
    q1 = sel(c["iso00"] | c["iso10"] | c["sad_main"], lef,
             sel(c["verti"], bot, rig))
    L = jnp.where(c["exists1"] & valid, seglen(p1, q1), 0.0)
    q2 = sel(c["sad_main"], rig, lef)
    L = L + jnp.where(c["saddle"] & valid, seglen(bot, q2), 0.0)
    return jnp.sum(L)


def _kernel(lev_ref, mm_ref, v00_ref, v01_ref, v10_ref, v11_ref,
            y0_ref, y1_ref, x0_ref, x1_ref, valid_ref, out_ref, acc_ref, *,
            latlon: bool, n_levels: int, n_pad: int):
    b = pl.program_id(0)
    rb = pl.program_id(1)
    n = pl.program_id(2)
    n_rb = pl.num_programs(1)

    @pl.when((rb == 0) & (n == 0))
    def _():
        acc_ref[...] = jnp.zeros(acc_ref.shape, acc_ref.dtype)

    # scalar-prefetch operands are FLAT: SMEM pads each trailing 2-D tile to
    # (8, 128), which overflows the 1 MB SMEM for large batches (the windowed
    # local-length workload runs hundreds of windows per call)
    lev = lev_ref[b * n_levels + n]
    mn = mm_ref[(b * n_rb + rb) * 2]
    mx = mm_ref[(b * n_rb + rb) * 2 + 1]

    @pl.when((lev >= mn) & (lev <= mx))
    def _():
        y0 = y0_ref[0]                   # (RB, 1)
        y1 = y1_ref[0]
        x0 = x0_ref[0]                   # (1, NxC)
        x1 = x1_ref[0]
        cnt = _block_length(lev, v00_ref[0], v01_ref[0], v10_ref[0],
                            v11_ref[0], y0, y1, x0, x1, valid_ref[0] > 0,
                            latlon)
        iota_n = jax.lax.broadcasted_iota(jnp.int32, (1, n_pad), 1)
        acc_ref[0:1, :] += jnp.where(iota_n == n, cnt, 0.0)

    @pl.when((rb == n_rb - 1) & (n == n_levels - 1))
    def _():
        out_ref[0] = jnp.broadcast_to(acc_ref[0:1, :], out_ref.shape[1:])


@partial(jax.jit, static_argnames=("latlon", "interpret"))
def contour_lengths_pallas(data: jax.Array, levels: jax.Array,
                           ydef: jax.Array, xdef: jax.Array, *,
                           latlon: bool, interpret: bool = False) -> jax.Array:
    """Total perimeter per level.  data (B, Ny, Nx); levels (B, N);
    ydef/xdef coordinate vectors (radians if latlon, else meters) — either
    shared (Ny,)/(Nx,) or per-batch-element (B, Ny)/(B, Nx) (the windowed
    local-length workload gives every window its own coordinate patch).
    Returns (B, N) raw totals (0 for empty contours; caller NaN-ifies and
    applies the Earth-radius factor)."""
    B, Ny, Nx = data.shape
    N = levels.shape[-1]
    n_pad = -(-N // 128) * 128
    ydef = jnp.broadcast_to(ydef, (B, Ny))
    xdef = jnp.broadcast_to(xdef, (B, Nx))

    v00 = data[:, :-1, :-1]
    v01 = data[:, :-1, 1:]
    v10 = data[:, 1:, :-1]
    v11 = data[:, 1:, 1:]
    valid = ~(jnp.isnan(v00) | jnp.isnan(v01) | jnp.isnan(v10) |
              jnp.isnan(v11))
    NyC, NxC = Ny - 1, Nx - 1
    pad_r = (-NyC) % _RB
    if pad_r:
        def padr(a, fill):
            return jnp.concatenate(
                [a, jnp.full((B, pad_r, NxC), fill, a.dtype)], axis=1)
        v00, v01, v10, v11 = (padr(a, jnp.nan) for a in (v00, v01, v10, v11))
        valid = jnp.concatenate(
            [valid, jnp.zeros((B, pad_r, NxC), bool)], axis=1)
    NyCp = NyC + pad_r
    n_rb = NyCp // _RB

    # per-(batch, row-block) corner min/max over valid cells for the pretest
    lo = jnp.where(valid, jnp.minimum(jnp.minimum(v00, v01),
                                      jnp.minimum(v10, v11)), jnp.inf)
    hi = jnp.where(valid, jnp.maximum(jnp.maximum(v00, v01),
                                      jnp.maximum(v10, v11)), -jnp.inf)
    lo = jnp.min(lo.reshape(B, n_rb, _RB * NxC), axis=-1)
    hi = jnp.max(hi.reshape(B, n_rb, _RB * NxC), axis=-1)
    minmax = jnp.stack([lo, hi], axis=-1).reshape(-1)   # flat (B*n_rb*2,)

    ypad = jnp.zeros((B, pad_r), ydef.dtype)
    y0 = jnp.concatenate([ydef[:, :-1], ypad], axis=1)[:, :, None]
    y1 = jnp.concatenate([ydef[:, 1:], ypad], axis=1)[:, :, None]
    x0 = xdef[:, None, :-1]                           # (B, 1, NxC)
    x1 = xdef[:, None, 1:]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, n_rb, N),
        in_specs=[
            pl.BlockSpec((1, _RB, NxC), lambda b, r, n, *_: (b, r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _RB, NxC), lambda b, r, n, *_: (b, r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _RB, NxC), lambda b, r, n, *_: (b, r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _RB, NxC), lambda b, r, n, *_: (b, r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _RB, 1), lambda b, r, n, *_: (b, r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _RB, 1), lambda b, r, n, *_: (b, r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, NxC), lambda b, r, n, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, NxC), lambda b, r, n, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _RB, NxC), lambda b, r, n, *_: (b, r, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 8, n_pad), lambda b, r, n, *_: (b, 0, 0)),
        scratch_shapes=[pltpu.VMEM((8, n_pad), data.dtype)],
    )
    out = pl.pallas_call(
        partial(_kernel, latlon=latlon, n_levels=N, n_pad=n_pad),
        out_shape=jax.ShapeDtypeStruct((B, 8, n_pad), data.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(levels.reshape(-1), minmax, v00, v01, v10, v11, y0, y1, x0, x1,
      valid.astype(data.dtype))
    return out[:, 0, :N]


def _local_kernel(lev_ref, v00_ref, v01_ref, v10_ref, v11_ref,
                  y0_ref, y1_ref, x0_ref, x1_ref, valid_ref, out_ref, *,
                  latlon: bool, wb: int):
    g = pl.program_id(0)

    def body(w, _):
        lev = lev_ref[g * wb + w]
        cnt = _block_length(lev, v00_ref[w], v01_ref[w], v10_ref[w],
                            v11_ref[w], y0_ref[w], y1_ref[w], x0_ref[w],
                            x1_ref[w], valid_ref[w] > 0, latlon)
        # NaN level (empty window) -> NaN total; lanes broadcast, caller
        # reads lane 0
        cnt = jnp.where(jnp.isnan(lev), jnp.nan, cnt)
        out_ref[w, :] = jnp.broadcast_to(cnt, (out_ref.shape[-1],))
        return 0

    jax.lax.fori_loop(0, wb, body, 0, unroll=False)


@partial(jax.jit, static_argnames=("latlon", "wb", "interpret"))
def local_lengths_pallas(patches: jax.Array, levels: jax.Array,
                         ywin: jax.Array, xwin: jax.Array, *,
                         latlon: bool, wb: int = 16,
                         interpret: bool = False) -> jax.Array:
    """Per-window contour length at one level per window.

    patches (nw, W, W) tracer windows; levels (nw,); ywin (nw, W),
    xwin (nw, W) per-window coordinates (radians if latlon).  Returns (nw,)
    raw totals (0 when the level crosses nothing).  ``wb`` windows are
    evaluated per grid step so the per-step dispatch cost amortizes —
    one tiny block per step measured ~24 us of pure overhead.
    """
    nw, W, _ = patches.shape
    WC = W - 1
    pad_w = (-nw) % wb
    if pad_w:
        patches = jnp.concatenate(
            [patches, jnp.full((pad_w, W, W), jnp.nan, patches.dtype)])
        levels = jnp.concatenate(
            [levels, jnp.full((pad_w,), jnp.nan, levels.dtype)])
        ywin = jnp.concatenate([ywin, jnp.zeros((pad_w, W), ywin.dtype)])
        xwin = jnp.concatenate([xwin, jnp.zeros((pad_w, W), xwin.dtype)])
    nwp = nw + pad_w

    v00 = patches[:, :-1, :-1]
    v01 = patches[:, :-1, 1:]
    v10 = patches[:, 1:, :-1]
    v11 = patches[:, 1:, 1:]
    valid = (~(jnp.isnan(v00) | jnp.isnan(v01) | jnp.isnan(v10) |
               jnp.isnan(v11))).astype(patches.dtype)
    y0 = ywin[:, :-1, None]
    y1 = ywin[:, 1:, None]
    x0 = xwin[:, None, :-1]
    x1 = xwin[:, None, 1:]

    win_specs = [pl.BlockSpec((wb, WC, WC), lambda g, *_: (g, 0, 0),
                              memory_space=pltpu.VMEM) for _ in range(5)]
    coord_specs = [
        pl.BlockSpec((wb, WC, 1), lambda g, *_: (g, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((wb, WC, 1), lambda g, *_: (g, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((wb, 1, WC), lambda g, *_: (g, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((wb, 1, WC), lambda g, *_: (g, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nwp // wb,),
        in_specs=win_specs[:4] + coord_specs + win_specs[4:],
        out_specs=pl.BlockSpec((wb, 128), lambda g, *_: (g, 0)),
    )
    out = pl.pallas_call(
        partial(_local_kernel, latlon=latlon, wb=wb),
        out_shape=jax.ShapeDtypeStruct((nwp, 128), patches.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(levels, v00, v01, v10, v11, y0, y1, x0, x1, valid)
    return out[:nw, 0]
