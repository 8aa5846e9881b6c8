"""Pallas TPU kernel for the weighted conditional-integral CDF.

Instead of digitize + scatter-add (XLA's scatter serializes on TPU), this
kernel computes the CDF *directly*: for each contour level k,
CDF[k] = sum_t w_t * [v_t < edge_{k+1}] — a masked reduction per level over a
VMEM-resident tile, which is pure VPU work with zero scatter traffic.  The
comparison-per-level form costs N*T flops per tile, identical to the digitize
form, but maps perfectly onto the hardware.

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


def _kernel(v_ref, e_ref, w_ref, out_ref, *, n_bins: int):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    v = v_ref[...]                       # (1, T)
    w = w_ref[...]
    e0 = e_ref[0, 0]
    etop = e_ref[0, n_bins]
    valid = (v >= e0) & (v <= etop) & ~jnp.isnan(v)
    wv = jnp.where(valid & ~jnp.isnan(w), w, 0.0)
    total = jnp.sum(wv)

    def body(k, _):
        e = e_ref[0, k + 1]
        # strict < for interior levels; the top level gets everything valid
        # (right-inclusive last edge), handled by the k == n_bins-1 branch
        cnt = jnp.sum(jnp.where(v < e, wv, 0.0))
        cnt = jnp.where(k == n_bins - 1, total, cnt)
        out_ref[0, k] += cnt
        return 0

    jax.lax.fori_loop(0, n_bins, body, 0, unroll=False)


@partial(jax.jit, static_argnames=("tile", "interpret"))
def histogram_pallas(values: jax.Array, edges: jax.Array, weights: jax.Array,
                     *, tile: int = 8192, interpret: bool = False) -> jax.Array:
    """Ascending-order weighted CDF.

    values/weights : (B, G); edges : (B, N+1) ascending.
    Returns (B, N) with out[b, k] = sum of weights where
    edges[b,0] <= v < edges[b,k+1] (top edge inclusive at k = N-1).
    """
    B, G = values.shape
    N = edges.shape[-1] - 1
    tile = min(tile, max(G, 128))
    Gp = -(-G // tile) * tile
    if Gp != G:
        pad = jnp.full((B, Gp - G), jnp.nan, values.dtype)
        values = jnp.concatenate([values, pad], axis=1)
        weights = jnp.concatenate([weights, jnp.zeros_like(pad)], axis=1)

    grid = (B, Gp // tile)
    return pl.pallas_call(
        partial(_kernel, n_bins=N),
        out_shape=jax.ShapeDtypeStruct((B, N), values.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile), lambda b, t: (b, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N + 1), lambda b, t: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda b, t: (b, t),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, N), lambda b, t: (b, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(values, edges, weights)
