"""Pallas TPU kernel for the weighted conditional-integral CDF.

Instead of digitize + scatter-add (XLA's scatter serializes on TPU), this
kernel computes the CDF *directly*: for each contour level k,
CDF[k] = sum_t w_t * [v_t < edge_{k+1}] — a masked reduction per level over a
VMEM-resident tile, which is pure VPU work with zero scatter traffic.  The
comparison-per-level form costs N*T flops per tile, identical to the digitize
form, but maps perfectly onto the hardware.  Edges are a scalar-prefetch
operand (SMEM); the CDF accumulates in a VMEM scratch across tiles and is
flushed on the last tile.

Multiple weight channels (e.g. the Keff chain's area and |grad q|^2
integrals) share one digitize: the per-level comparison mask is computed once
and multiplied into each channel (``histogram_pallas_multi``).

Edge semantics match ops/histogram.py exactly: values below edges[0]
(= bin_min - step) are excluded, the top edge is right-inclusive, NaN values
and NaN weights contribute nothing.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(e_ref, v_ref, w_ref, out_ref, acc_ref, *, n_bins: int,
            n_pad: int, channels: int):
    b = pl.program_id(0)
    t = pl.program_id(1)
    nt = pl.num_programs(1)

    @pl.when(t == 0)
    def _():
        acc_ref[...] = jnp.zeros(acc_ref.shape, acc_ref.dtype)

    v = v_ref[0]                         # (R, 128)
    e0 = e_ref[b, 0]
    etop = e_ref[b, n_bins]
    valid = (v >= e0) & (v <= etop) & ~jnp.isnan(v)
    # weight channels share the digitize: one mask per level, C multiplies
    wvs = []
    totals = []
    for c in range(channels):
        w = w_ref[0, c]
        wv = jnp.where(valid & ~jnp.isnan(w), w, 0.0)
        wvs.append(wv)
        totals.append(jnp.sum(wv))

    iota_n = jax.lax.broadcasted_iota(jnp.int32, (1, n_pad), 1)

    # Levels are processed in blocks of 16, unrolled inside the loop body, so
    # Mosaic can interleave the independent compare/select/reduce chains
    # instead of serializing one full-tile reduction per level (measured
    # ~13% -> ~70% VPU utilization together with the 256-row tile).  Blocks
    # may run past n_bins into the slots the caller slices off; edge reads
    # clamp to stay in bounds.
    LB = 16
    n_blk = (n_pad + LB - 1) // LB

    def body(blk, _):
        k0 = blk * LB
        for kk in range(LB):
            k = k0 + kk
            k_safe = jnp.minimum(k, n_bins - 1)
            e = e_ref[b, k_safe + 1]
            below = v < e
            onehot = iota_n == k
            for c in range(channels):
                cnt = jnp.sum(jnp.where(below, wvs[c], 0.0))
                # top level is right-inclusive (np.histogram's closed last
                # bin)
                cnt = jnp.where(k == n_bins - 1, totals[c], cnt)
                # scalar VMEM stores are not lowerable: accumulate through a
                # one-hot row vector instead
                acc_ref[c:c + 1, :] += jnp.where(onehot, cnt, 0.0)
        return 0

    jax.lax.fori_loop(0, n_blk, body, 0, unroll=False)

    @pl.when(t == nt - 1)
    def _():
        out_ref[0] = acc_ref[...]


@partial(jax.jit, static_argnames=("tile", "interpret"))
def histogram_pallas_multi(values: jax.Array, edges: jax.Array,
                           weights: jax.Array, *, tile: int = 32768,
                           interpret: bool = False) -> jax.Array:
    """Multi-channel ascending-order weighted CDF.

    values : (B, G); edges : (B, N+1) ascending; weights : (B, C, G), C <= 8.
    Returns (B, C, N) with out[b, c, k] = sum of weights[b, c] where
    edges[b,0] <= v < edges[b,k+1] (top edge inclusive at k = N-1).
    """
    B, G = values.shape
    C = weights.shape[1]
    assert C <= 8, "at most 8 weight channels per pass"
    N = edges.shape[-1] - 1
    n_pad = -(-N // 128) * 128

    lanes = 128
    rows_per_tile = max(8, tile // lanes)
    Gp = -(-G // (rows_per_tile * lanes)) * (rows_per_tile * lanes)
    if Gp != G:
        pad = jnp.full((B, Gp - G), jnp.nan, values.dtype)
        values = jnp.concatenate([values, pad], axis=1)
        wpad = jnp.zeros((B, C, Gp - G), weights.dtype)
        weights = jnp.concatenate([weights, wpad], axis=2)
    rows = Gp // lanes
    v3 = values.reshape(B, rows, lanes)
    w4 = weights.reshape(B, C, rows, lanes)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, rows // rows_per_tile),
        in_specs=[
            pl.BlockSpec((1, rows_per_tile, lanes), lambda b, t, *_: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, rows_per_tile, lanes),
                         lambda b, t, *_: (b, 0, t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 8, n_pad), lambda b, t, *_: (b, 0, 0)),
        scratch_shapes=[pltpu.VMEM((8, n_pad), values.dtype)],
    )
    out = pl.pallas_call(
        partial(_kernel, n_bins=N, n_pad=n_pad, channels=C),
        out_shape=jax.ShapeDtypeStruct((B, 8, n_pad), values.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(edges, v3, w4)
    return out[:, :C, :N]


def histogram_pallas(values: jax.Array, edges: jax.Array, weights: jax.Array,
                     *, tile: int = 16384, interpret: bool = False
                     ) -> jax.Array:
    """Single-channel CDF: values/weights (B, G), edges (B, N+1) -> (B, N)."""
    out = histogram_pallas_multi(values, edges, weights[:, None, :],
                                 tile=tile, interpret=interpret)
    return out[:, 0, :]
