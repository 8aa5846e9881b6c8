"""Pallas TPU kernel for the weighted conditional-integral CDF.

Instead of digitize + scatter-add (XLA's scatter serializes on TPU), this
kernel computes the CDF *directly*: for each contour level k,
CDF[k] = sum_t w_t * [v_t < edge_{k+1}] — a masked reduction per level over a
VMEM-resident tile, which is pure VPU work with zero scatter traffic.  The
comparison-per-level form costs N*T flops per tile, identical to the digitize
form, but maps perfectly onto the hardware.  Edges are a scalar-prefetch
operand (SMEM); the CDF accumulates in a VMEM scratch across tiles and is
flushed on the last tile.

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
            n_pad: int):
    b = pl.program_id(0)
    t = pl.program_id(1)
    nt = pl.num_programs(1)

    @pl.when(t == 0)
    def _():
        acc_ref[...] = jnp.zeros(acc_ref.shape, acc_ref.dtype)

    v = v_ref[0]                         # (R, 128)
    w = w_ref[0]
    e0 = e_ref[b, 0]
    etop = e_ref[b, n_bins]
    valid = (v >= e0) & (v <= etop) & ~jnp.isnan(v)
    wv = jnp.where(valid & ~jnp.isnan(w), w, 0.0)
    total = jnp.sum(wv)

    iota_n = jax.lax.broadcasted_iota(jnp.int32, (1, n_pad), 1)

    def body(k, _):
        e = e_ref[b, k + 1]
        cnt = jnp.sum(jnp.where(v < e, wv, 0.0))
        # top level is right-inclusive (np.histogram's closed last bin)
        cnt = jnp.where(k == n_bins - 1, total, cnt)
        # scalar VMEM stores are not lowerable: accumulate through a one-hot
        # row vector instead
        acc_ref[0:1, :] += jnp.where(iota_n == k, cnt, 0.0)
        return 0

    jax.lax.fori_loop(0, n_bins, body, 0, unroll=False)

    @pl.when(t == nt - 1)
    def _():
        out_ref[0] = jnp.broadcast_to(acc_ref[0:1, :], out_ref.shape[1:])


@partial(jax.jit, static_argnames=("tile", "interpret"))
def histogram_pallas(values: jax.Array, edges: jax.Array, weights: jax.Array,
                     *, tile: int = 16384, interpret: bool = False
                     ) -> jax.Array:
    """Ascending-order weighted CDF.

    values/weights : (B, G); edges : (B, N+1) ascending.
    Returns (B, N) with out[b, k] = sum of weights where
    edges[b,0] <= v < edges[b,k+1] (top edge inclusive at k = N-1).
    """
    B, G = values.shape
    N = edges.shape[-1] - 1
    n_pad = -(-N // 128) * 128

    lanes = 128
    rows_per_tile = max(8, tile // lanes)
    Gp = -(-G // (rows_per_tile * lanes)) * (rows_per_tile * lanes)
    if Gp != G:
        pad = jnp.full((B, Gp - G), jnp.nan, values.dtype)
        values = jnp.concatenate([values, pad], axis=1)
        weights = jnp.concatenate([weights, jnp.zeros_like(pad)], axis=1)
    rows = Gp // lanes
    v3 = values.reshape(B, rows, lanes)
    w3 = weights.reshape(B, rows, lanes)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, rows // rows_per_tile),
        in_specs=[
            pl.BlockSpec((1, rows_per_tile, lanes), lambda b, t, *_: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows_per_tile, lanes), lambda b, t, *_: (b, t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 8, n_pad), lambda b, t, *_: (b, 0, 0)),
        scratch_shapes=[pltpu.VMEM((8, n_pad), values.dtype)],
    )
    out = pl.pallas_call(
        partial(_kernel, n_bins=N, n_pad=n_pad),
        out_shape=jax.ShapeDtypeStruct((B, 8, n_pad), values.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(edges, v3, w3)
    return out[:, 0, :N]
