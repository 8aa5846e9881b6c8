"""Pallas TPU kernel for traversal-free contour perimeter lengths.

The XLA formulation evaluates every (cell, level) pair densely — for zonally
banded geophysical tracers that wastes most of the transcendental work, since
a given contour level only crosses the latitude band containing it.  Here the
cell rows are split into row blocks and the levels are SORTED outside the
kernel, so the levels a block can cross form one contiguous index range
[n0, n1) (block corner min/max -> searchsorted, precomputed on the XLA side).
Each (batch, row-block) grid step runs a dynamic `fori_loop` over exactly its
active levels — inactive (block, level) pairs cost nothing, not even a grid
step.

Everything level-independent is hoisted out of that loop and off the chip:
the four edge-denominator reciprocals arrive as precomputed panels (no
per-level divides), and the geodesic segment length is evaluated in OFFSET
form — endpoint positions are carried as small offsets from the cell's
(y0, x0) corner, so the haversine needs only the precomputed per-row
sin/cos(y0) plus short odd/even Maclaurin polynomials of the (cell-sized)
offsets instead of full-range transcendentals.  The offset haversine is
mathematically identical to the reference's (utils.py:734-761): it evaluates
the same sin^2(dlat/2) + cos(lat1)cos(lat2)sin^2(dlon/2) with the same
linear-in-level endpoint interpolation, only the trig is computed by exact
angle addition from tabulated row values.

Per-level totals accumulate through a one-hot row into a VMEM scratch,
flushed once per batch element; results are unsorted back outside.

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
# Smaller blocks tighten the per-block active-level range (a level crosses
# fewer 16-row bands than 64-row bands) but add per-block fixed cost.  On the
# 32x256x512 N=121 full-range case (v5e): RB=16 -> 4.9 ms at 33% of the
# active-block op model; RB=8 -> 4.7 ms but only 27% (per-block overhead eats
# the tighter pretest).  RB=16 keeps the better model margin at ~same time.


def _sin_small(u):
    """sin(u) for |u| <= ~0.45 rad (cell-sized angles): odd Maclaurin through
    u^7 — truncation < 2e-9 relative at u=0.45, far below f32 eps."""
    u2 = u * u
    return u * (1.0 + u2 * (-1.0 / 6.0 + u2 * (1.0 / 120.0
                                               + u2 * (-1.0 / 5040.0))))


def _cos_small(u):
    """cos(u) for |u| <= ~0.45 rad: even Maclaurin through u^6
    (truncation u^8/40320 < 4e-9 absolute at u=0.45)."""
    u2 = u * u
    return 1.0 + u2 * (-0.5 + u2 * (1.0 / 24.0 + u2 * (-1.0 / 720.0)))


def _asin_small(z):
    """asin(z) for z <= ~0.3 (half-chord of a cell diagonal): odd series
    through z^9 — truncation < 3e-8 absolute at z=0.3."""
    z2 = z * z
    return z * (1.0 + z2 * (1.0 / 6.0 + z2 * (3.0 / 40.0
                                              + z2 * (15.0 / 336.0
                                                      + z2 * (105.0 / 3456.0)))))


def _offset_block_length(lev, v00, v01, v10, v11, it, ib, il, ir,
                         cy, sy, dyr, dxc, valid, latlon: bool,
                         reduce: bool = True):
    """Sum of in-cell segment lengths for one level over a corner-panel block.

    Endpoint positions are carried as (olat, olon) OFFSETS from the cell's
    (y0, x0) corner; ``it/ib/il/ir`` are the precomputed reciprocals of the
    four edge denominators (0 where degenerate, reproducing the frac()
    zero-guard of diagnostics/length.py); ``cy``/``sy`` are cos/sin of the
    row's y0 (latlon only); ``dyr`` (RB, 1) and ``dxc`` (1, NxC) the cell
    extents.

    Honest per-(cell, level) op model of this function, counting each vector
    op / FMA / compare / select as one VPU slot (used by bench.py's
    measured-active-block roofline): 4 cmp + 4 xor + ~21 case-logic bools
    + 8 frac FMAs + 4 offset muls + 10 selects + 1 seglen at ~44 slots
    (2x sin_small(5) + 2x cos-angle-add(2x8+1) + combine 3 + sqrt ~4
    + asin_small 7 + scale 1) + 3 accum = ~98 slots; the rare saddle second
    segment is gated behind a block-level `lax.cond`.  OPS_PER_CELL_LEVEL
    below exports this count.
    """
    a00 = v00 > lev
    a01 = v01 > lev
    a10 = v10 > lev
    a11 = v11 > lev
    x01 = a00 ^ a01
    x23 = a10 ^ a11
    x02 = a00 ^ a10
    x13 = a01 ^ a11

    iso00 = x01 & x02 & ~x13
    iso01 = x01 & x13 & ~x02
    iso10 = x02 & x23 & ~x01
    iso11 = x13 & x23 & ~x01
    horiz = ~x01 & ~x23 & x02
    verti = ~x02 & ~x13 & x01
    sad_main = a00 & a11 & ~a01 & ~a10
    sad_anti = a01 & a10 & ~a00 & ~a11
    exists1 = (iso00 | iso01 | iso10 | iso11 | horiz | verti |
               sad_main | sad_anti) & valid
    saddle = (sad_main | sad_anti) & valid

    ft = (lev - v00) * it
    fb = (lev - v10) * ib
    fl = (lev - v00) * il
    fr = (lev - v01) * ir

    zero = jnp.zeros((), lev.dtype)
    top = (zero, ft * dxc)
    bot = (dyr, fb * dxc)
    lef = (fl * dyr, zero)
    rig = (fr * dyr, dxc)

    def sel(cond, p, q):
        return (jnp.where(cond, p[0], q[0]), jnp.where(cond, p[1], q[1]))

    if latlon:
        def seglen(p, q):
            sl = _sin_small(0.5 * (p[0] - q[0]))
            sn = _sin_small(0.5 * (p[1] - q[1]))
            # cos(y0 + o) by exact angle addition from the tabulated row trig
            c1 = cy * _cos_small(p[0]) - sy * _sin_small(p[0])
            c2 = cy * _cos_small(q[0]) - sy * _sin_small(q[0])
            a = jnp.maximum(sl * sl + (c1 * c2) * (sn * sn), 0.0)
            return 2.0 * _asin_small(jnp.sqrt(a))
    else:
        def seglen(p, q):
            dy = p[0] - q[0]
            dx = p[1] - q[1]
            return jnp.sqrt(dy * dy + dx * dx)

    p1 = sel(horiz, lef, sel(iso10 | iso11, bot, top))
    q1 = sel(iso00 | iso10 | sad_main, lef, sel(verti, bot, rig))
    if reduce == "rows":
        # row_acc mode: reduce over SUBLANES only (a 4-step tree for RB=16),
        # leaving a (NxC,) lane vector the caller accumulates into a
        # per-level scratch row — the per-level cross-lane reduce chain and
        # the one-hot flush disappear (lanes fold once per batch element)
        cnt = jnp.sum(jnp.where(exists1, seglen(p1, q1), 0.0), axis=0)

        def with_saddle_rows():
            q2 = sel(sad_main, rig, lef)
            return jnp.sum(jnp.where(saddle, seglen(bot, q2), 0.0), axis=0)
        return cnt + jax.lax.cond(jnp.any(saddle), with_saddle_rows,
                                  lambda: jnp.zeros_like(cnt))
    if not reduce:
        # measurement mode (bench op-mix structure probe): the identical
        # per-cell math, returned as the (RB, NxC) panel WITHOUT the
        # full-panel reduction — isolates the reduce+one-hot serialization
        # cost from the op mix.  Production callers use reduce=True, whose
        # two-sum order is preserved bit-for-bit below.
        main = jnp.where(exists1, seglen(p1, q1), 0.0)

        def with_saddle_panel():
            q2 = sel(sad_main, rig, lef)
            return jnp.where(saddle, seglen(bot, q2), 0.0)
        return main + jax.lax.cond(jnp.any(saddle), with_saddle_panel,
                                   lambda: jnp.zeros_like(main))
    cnt = jnp.sum(jnp.where(exists1, seglen(p1, q1), 0.0))

    def with_saddle():
        q2 = sel(sad_main, rig, lef)
        return jnp.sum(jnp.where(saddle, seglen(bot, q2), 0.0))

    return cnt + jax.lax.cond(jnp.any(saddle), with_saddle,
                              lambda: jnp.zeros((), lev.dtype))


# Honest VPU-slot count per evaluated (cell, level) pair of the kernel above
# (see _offset_block_length docstring for the breakdown); bench.py multiplies
# this by the measured active (block, level) pair count times cells/block.
OPS_PER_CELL_LEVEL = 98


def _kernel(lev_ref, n0_ref, n1_ref, v00_ref, v01_ref, v10_ref, v11_ref,
            it_ref, ib_ref, il_ref, ir_ref, cy_ref, sy_ref, dy_ref, dx_ref,
            valid_ref, out_ref, acc_ref, *,
            latlon: bool, n_levels: int, n_pad: int, n_rb: int,
            level_unroll: int = 1, row_acc: bool = False):
    b = pl.program_id(0)
    rb = pl.program_id(1)

    @pl.when(rb == 0)
    def _():
        acc_ref[...] = jnp.zeros(acc_ref.shape, acc_ref.dtype)

    # scalar-prefetch operands are FLAT: SMEM pads each trailing 2-D tile to
    # (8, 128), which overflows the 1 MB SMEM for large batches (the windowed
    # local-length workload runs hundreds of windows per call)
    n0 = n0_ref[b * n_rb + rb]
    n1 = n1_ref[b * n_rb + rb]

    v00 = v00_ref[0]
    v01 = v01_ref[0]
    v10 = v10_ref[0]
    v11 = v11_ref[0]
    it = it_ref[0]
    ib = ib_ref[0]
    il = il_ref[0]
    ir = ir_ref[0]
    cy = cy_ref[0]                       # (RB, 1)
    sy = sy_ref[0]
    dyr = dy_ref[0]
    dxc = dx_ref[0]                      # (1, NxC)
    valid = valid_ref[0] > 0
    iota_n = jax.lax.broadcasted_iota(jnp.int32, (1, n_pad), 1)

    # level_unroll > 1 hand-unrolls U levels per dynamic iteration (tail
    # clamped + masked out of the one-hot, exact).  Measured on v5e
    # (tools/ab_length_unroll.py, 4 interleaved min-pooled rounds): u2
    # ~8% SLOWER than u1 outside one outlier round, u4/u8 clearly worse
    # (tail waste + register pressure) — interleaving the per-level chains
    # does NOT pay, so the default stays 1.  Kept as a measurement knob.
    U = max(1, level_unroll)

    if row_acc:
        # per-level SUBLANE-only reduce, accumulated into this level's row
        # of a (n_pad, NxC) scratch via a dynamic-row RMW; lanes fold ONCE
        # per batch element at flush — removes the per-level cross-lane
        # reduce chain and the one-hot flush from the inner loop
        def body(i, _):
            for u in range(U):
                n = n0 + i * U + u
                n_c = jnp.minimum(n, n1 - 1)
                lev = lev_ref[b * n_levels + n_c]
                row = _offset_block_length(lev, v00, v01, v10, v11, it, ib,
                                           il, ir, cy, sy, dyr, dxc, valid,
                                           latlon, reduce="rows")
                row = jnp.where(n < n1, row, 0.0)
                acc_ref[pl.ds(n_c, 1), :] += row[None, :]
            return 0

        jax.lax.fori_loop(0, (n1 - n0 + U - 1) // U, body, 0, unroll=False)

        @pl.when(rb == n_rb - 1)
        def _():
            total = jnp.sum(acc_ref[...], axis=1)          # one lane fold
            out_ref[0] = jnp.broadcast_to(total[:, None], out_ref.shape[1:])
        return

    def body(i, _):
        for u in range(U):
            n = n0 + i * U + u
            n_c = jnp.minimum(n, n1 - 1)
            lev = lev_ref[b * n_levels + n_c]
            cnt = _offset_block_length(lev, v00, v01, v10, v11, it, ib, il,
                                       ir, cy, sy, dyr, dxc, valid, latlon)
            cnt = jnp.where(n < n1, cnt, 0.0)
            acc_ref[0:1, :] += jnp.where(iota_n == n_c, cnt, 0.0)
        return 0

    jax.lax.fori_loop(0, (n1 - n0 + U - 1) // U, body, 0, unroll=False)

    @pl.when(rb == n_rb - 1)
    def _():
        out_ref[0] = jnp.broadcast_to(acc_ref[0:1, :], out_ref.shape[1:])


def _safe_inv(d):
    return jnp.where(d == 0, 0.0, 1.0 / jnp.where(d == 0, 1.0, d))


def _block_panels(data, ydef, xdef, latlon: bool):
    """Corner/reciprocal/trig panels + per-(batch, row-block) corner min/max
    shared by the kernel launch and the bench's active-pair accounting."""
    B, Ny, Nx = data.shape
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
    n_rb = (NyC + pad_r) // _RB

    # per-(batch, row-block) corner min/max over valid cells for the pretest
    lo = jnp.where(valid, jnp.minimum(jnp.minimum(v00, v01),
                                      jnp.minimum(v10, v11)), jnp.inf)
    hi = jnp.where(valid, jnp.maximum(jnp.maximum(v00, v01),
                                      jnp.maximum(v10, v11)), -jnp.inf)
    lo = jnp.min(lo.reshape(B, n_rb, _RB * NxC), axis=-1)
    hi = jnp.max(hi.reshape(B, n_rb, _RB * NxC), axis=-1)

    inv_t = _safe_inv(v01 - v00)
    inv_b = _safe_inv(v11 - v10)
    inv_l = _safe_inv(v10 - v00)
    inv_r = _safe_inv(v11 - v01)

    ypad = jnp.zeros((B, pad_r), ydef.dtype)
    y0 = jnp.concatenate([ydef[:, :-1], ypad], axis=1)
    dyr = (jnp.concatenate([ydef[:, 1:], ypad], axis=1) - y0)[:, :, None]
    dxc = (xdef[:, 1:] - xdef[:, :-1])[:, None, :]
    if latlon:
        cy = jnp.cos(y0)[:, :, None]
        sy = jnp.sin(y0)[:, :, None]
    else:
        cy = jnp.ones_like(y0)[:, :, None]
        sy = jnp.zeros_like(y0)[:, :, None]
    return (v00, v01, v10, v11, inv_t, inv_b, inv_l, inv_r, cy, sy, dyr,
            dxc, valid, lo, hi, n_rb, NxC)


def _active_ranges(levels, lo, hi):
    """Sorted levels + the contiguous active-index range per (batch, block)."""
    order = jnp.argsort(levels, axis=-1)                 # NaNs sort last
    lev_s = jnp.take_along_axis(levels, order, axis=-1)
    n0 = jax.vmap(lambda l, v: jnp.searchsorted(l, v, side="left"))(lev_s, lo)
    n1 = jax.vmap(lambda l, v: jnp.searchsorted(l, v, side="right"))(lev_s, hi)
    n1 = jnp.maximum(n0, n1)
    return order, lev_s, n0.astype(jnp.int32), n1.astype(jnp.int32)


@jax.jit
def active_pair_count(data: jax.Array, levels: jax.Array) -> jax.Array:
    """Number of (row-block, level) pairs the kernel actually evaluates for
    these inputs — the basis of bench.py's measured-active-block op model."""
    B, Ny, Nx = data.shape
    ydef = jnp.zeros((B, Ny), data.dtype)
    xdef = jnp.zeros((B, Nx), data.dtype)
    panels = _block_panels(data, ydef, xdef, latlon=False)
    lo, hi = panels[13], panels[14]
    levels = jnp.broadcast_to(levels, (B, levels.shape[-1]))
    _, _, n0, n1 = _active_ranges(levels, lo, hi)
    return jnp.sum(n1 - n0)


@partial(jax.jit, static_argnames=("latlon", "interpret", "level_unroll",
                                   "row_acc"))
def contour_lengths_pallas(data: jax.Array, levels: jax.Array,
                           ydef: jax.Array, xdef: jax.Array, *,
                           latlon: bool, interpret: bool = False,
                           level_unroll: int = 1,
                           row_acc: bool = True) -> jax.Array:
    """Total perimeter per level.  data (B, Ny, Nx); levels (B, N);
    ydef/xdef coordinate vectors (radians if latlon, else meters) — either
    shared (Ny,)/(Nx,) or per-batch-element (B, Ny)/(B, Nx) (the windowed
    local-length workload gives every window its own coordinate patch).
    Returns (B, N) raw totals (0 for empty contours; caller NaN-ifies and
    applies the Earth-radius factor).

    ``row_acc=True`` (default) accumulates per-level SUBLANE-reduced rows
    into a (levels, NxC) scratch and folds lanes once per batch element —
    measured ~8% faster than the per-level scalar one-hot flush (v5e,
    4/4 interleaved min-pooled rounds, tools/ab_length_rowacc.py), taking
    the kernel to ~83% of its same-structure op-mix ceiling.  Differs from
    row_acc=False only in summation order (~3e-7 relative)."""
    B, Ny, Nx = data.shape
    N = levels.shape[-1]
    n_pad = -(-N // 128) * 128
    ydef = jnp.broadcast_to(ydef, (B, Ny)).astype(data.dtype)
    xdef = jnp.broadcast_to(xdef, (B, Nx)).astype(data.dtype)
    levels = jnp.broadcast_to(levels, (B, N))

    (v00, v01, v10, v11, inv_t, inv_b, inv_l, inv_r, cy, sy, dyr, dxc,
     valid, lo, hi, n_rb, NxC) = _block_panels(data, ydef, xdef, latlon)
    order, lev_s, n0, n1 = _active_ranges(levels, lo, hi)

    big = pl.BlockSpec((1, _RB, NxC), lambda b, r, *_: (b, r, 0),
                       memory_space=pltpu.VMEM)
    row = pl.BlockSpec((1, _RB, 1), lambda b, r, *_: (b, r, 0),
                       memory_space=pltpu.VMEM)
    col = pl.BlockSpec((1, 1, NxC), lambda b, r, *_: (b, 0, 0),
                       memory_space=pltpu.VMEM)
    if row_acc:
        out_block = pl.BlockSpec((1, n_pad, 128), lambda b, r, *_: (b, 0, 0))
        out_sds = jax.ShapeDtypeStruct((B, n_pad, 128), data.dtype)
        scratch = [pltpu.VMEM((n_pad, NxC), data.dtype)]
    else:
        out_block = pl.BlockSpec((1, 8, n_pad), lambda b, r, *_: (b, 0, 0))
        out_sds = jax.ShapeDtypeStruct((B, 8, n_pad), data.dtype)
        scratch = [pltpu.VMEM((8, n_pad), data.dtype)]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B, n_rb),
        in_specs=[big] * 8 + [row, row, row, col, big],
        out_specs=out_block,
        scratch_shapes=scratch,
    )
    out = pl.pallas_call(
        partial(_kernel, latlon=latlon, n_levels=N, n_pad=n_pad, n_rb=n_rb,
                level_unroll=level_unroll, row_acc=row_acc),
        out_shape=out_sds,
        grid_spec=grid_spec,
        interpret=interpret,
    )(lev_s.reshape(-1), n0.reshape(-1), n1.reshape(-1),
      v00, v01, v10, v11, inv_t, inv_b, inv_l, inv_r, cy, sy, dyr, dxc,
      valid.astype(data.dtype))
    out_s = out[:, :N, 0] if row_acc else out[:, 0, :N]
    # unsort: sorted position k holds the result of original level order[k]
    inv_perm = jnp.argsort(order, axis=-1)
    return jnp.take_along_axis(out_s, inv_perm, axis=-1)




def _local_kernel(lev_ref, v00_ref, v01_ref, v10_ref, v11_ref,
                  cy_ref, sy_ref, dy_ref, dx_ref, out_ref, *,
                  latlon: bool, wb: int):
    g = pl.program_id(0)

    def body(w, _):
        lev = lev_ref[g * wb + w]
        v00 = v00_ref[w]
        v01 = v01_ref[w]
        v10 = v10_ref[w]
        v11 = v11_ref[w]
        # each window is evaluated at ONE level, so there is nothing to
        # amortize by precomputing reciprocals outside — compute the edge
        # inverses (and the NaN-cell mask) here and keep VMEM for the
        # corner panels (the 3-D row/col operands of the first cut padded
        # every (.., 1) lane to 128 and OOM'd scoped vmem on hardware)
        valid = ~(jnp.isnan(v00) | jnp.isnan(v01) | jnp.isnan(v10) |
                  jnp.isnan(v11))
        cnt = _offset_block_length(
            lev, v00, v01, v10, v11,
            _safe_inv(v01 - v00), _safe_inv(v11 - v10),
            _safe_inv(v10 - v00), _safe_inv(v11 - v01),
            cy_ref[w][:, None], sy_ref[w][:, None], dy_ref[w][:, None],
            dx_ref[w][None, :], valid, latlon)
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
    one tiny block per step measured ~24 us of pure overhead.  Uses the same
    offset-form geometry as the global kernel (reciprocal edge denominators
    and tabulated row trig precomputed outside; no in-loop divides or
    full-range transcendentals).
    """
    nw, Wn, _ = patches.shape
    WC = Wn - 1
    pad_w = (-nw) % wb
    if pad_w:
        patches = jnp.concatenate(
            [patches, jnp.full((pad_w, Wn, Wn), jnp.nan, patches.dtype)])
        levels = jnp.concatenate(
            [levels, jnp.full((pad_w,), jnp.nan, levels.dtype)])
        ywin = jnp.concatenate([ywin, jnp.zeros((pad_w, Wn), ywin.dtype)])
        xwin = jnp.concatenate([xwin, jnp.zeros((pad_w, Wn), xwin.dtype)])

    v00 = patches[:, :-1, :-1]
    v01 = patches[:, :-1, 1:]
    v10 = patches[:, 1:, :-1]
    v11 = patches[:, 1:, 1:]
    y0 = ywin[:, :-1]                                   # (nw, WC) 2-D
    dyr = ywin[:, 1:] - y0
    dxc = xwin[:, 1:] - xwin[:, :-1]
    if latlon:
        cy = jnp.cos(y0)
        sy = jnp.sin(y0)
    else:
        cy = jnp.ones_like(y0)
        sy = jnp.zeros_like(y0)

    big = pl.BlockSpec((wb, WC, WC), lambda g, *_: (g, 0, 0),
                       memory_space=pltpu.VMEM)
    vec = pl.BlockSpec((wb, WC), lambda g, *_: (g, 0),
                       memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=((nw + pad_w) // wb,),
        in_specs=[big] * 4 + [vec] * 4,
        out_specs=pl.BlockSpec((wb, 128), lambda g, *_: (g, 0)),
    )
    out = pl.pallas_call(
        partial(_local_kernel, latlon=latlon, wb=wb),
        out_shape=jax.ShapeDtypeStruct((nw + pad_w, 128), patches.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(levels, v00, v01, v10, v11, cy, sy, dyr, dxc)
    return out[:nw, 0]
