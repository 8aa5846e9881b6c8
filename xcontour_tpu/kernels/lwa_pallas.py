"""Pallas TPU kernel for local finite-amplitude wave activity.

Why a kernel: the LWA recurrence touches every (surface j, cell) pair —
O(Ny^2 * Nx) work on O(Ny * Nx) data.  The XLA formulation (chunked vmap over
j) re-streams the tracer from HBM for every surface: ~Ny * field_size of HBM
traffic per snapshot (gigabytes per batch), hundreds of times the useful
footprint.  Here one snapshot (256x512 f32 = 0.5 MB) is DMA'd into VMEM once
per j-tile and the whole surface loop runs against on-chip data at VPU rate —
the kernel is compute-bound instead of HBM-bound.

Semantics are identical to diagnostics/lwa.py (reference core.py:696-905):
the index form of the surface mask is used — for strictly monotone equivalent
coordinates,  (y >= y_j when increasing | y <= y_j when decreasing)  is
exactly  (row index >= j)  — so no coordinate array is needed in-kernel.
NaN tracer cells contribute zero (the reference's nan-skipping integrate).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _mask_value(qe, m, increase: bool):
    """3-valued mask (core.py:759-766) as arithmetic select."""
    if increase:
        inner = jnp.where(qe > 0, -1.0, 0.0)
        return jnp.where(m, jnp.where(qe < 0, 1.0, 0.0), inner)
    inner = jnp.where(qe < 0, -1.0, 0.0)
    return jnp.where(m, jnp.where(qe > 0, 1.0, 0.0), inner)


def _part_zero(mask, part: str, increase: bool):
    if part == "all":
        return mask
    if part == "upper":
        keep = mask > 0 if increase else mask < 0
    else:  # lower
        keep = mask < 0 if increase else mask > 0
    return jnp.where(keep, mask, 0.0)


def _kernel(q_ref, Q_ref, W_ref, out_ref, *, tile_j: int, increase: bool,
            part: str, variant2: bool, ny: int):
    tj = pl.program_id(1)
    q = q_ref[0]                      # (Ny, Nx) resident in VMEM
    W = W_ref[...]
    iy = jax.lax.broadcasted_iota(jnp.int32, (q.shape[0], 1), 0)
    qnan = jnp.isnan(q)

    def body(jj, _):
        j = tj * tile_j + jj

        @pl.when(j < ny)
        def _():
            Qj = Q_ref[0, j]
            if variant2:
                # qe = q(y_j, x) - Q(y): outer difference of a tracer row
                # against the sorted profile (core.py:860)
                qrow = q_ref[0, j, :]              # (Nx,)
                Qcol = Q_ref[0, :]                 # (Ny,)
                qe = qrow[None, :] - Qcol[:, None]
                nan = jnp.isnan(qrow)[None, :] | jnp.isnan(Qcol)[:, None]
                mask = _mask_value(qe, iy >= j, not increase)
            else:
                qe = q - Qj
                nan = qnan
                mask = _mask_value(qe, iy >= j, increase)
            mask = _part_zero(mask, part, increase)
            term = jnp.where(nan, 0.0, qe * mask * W)
            out_ref[0, jj, :] = -jnp.sum(term, axis=0)
        return 0

    jax.lax.fori_loop(0, tile_j, body, 0, unroll=False)


@partial(jax.jit, static_argnames=("increase", "part", "variant2", "tile_j",
                                   "interpret"))
def lwa_pallas(q: jax.Array, Q: jax.Array, W: jax.Array, *, increase: bool,
               part: str = "all", variant2: bool = False, tile_j: int = 64,
               interpret: bool = False) -> jax.Array:
    """LWA on TPU via Pallas.

    q : (B, Ny, Nx) tracer;  Q : (B, Ny) sorted profile;  W : (Ny, Nx)
    composed weight (wei*dA or wei*dy).  Returns (B, Ny, Nx).
    """
    B, Ny, Nx = q.shape
    tile_j = min(tile_j, Ny)
    ntj = pl.cdiv(Ny, tile_j)
    grid = (B, ntj)

    out = pl.pallas_call(
        partial(_kernel, tile_j=tile_j, increase=increase, part=part.lower(),
                variant2=variant2, ny=Ny),
        out_shape=jax.ShapeDtypeStruct((B, ntj * tile_j, Nx), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, Ny, Nx), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Ny), lambda b, t: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Ny, Nx), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_j, Nx), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(q, Q, W)
    return out[:, :Ny, :]
