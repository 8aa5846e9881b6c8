"""Pallas TPU kernel for local finite-amplitude wave activity.

Why a kernel: the LWA recurrence touches every (surface j, cell) pair —
O(Ny^2 * Nx) work on O(Ny * Nx) data.  The XLA formulation (chunked vmap over
j) re-streams the tracer from HBM for every surface: ~Ny * field_size of HBM
traffic per snapshot (gigabytes per batch), hundreds of times the useful
footprint.  Here the snapshot block's index map is constant in the surface
grid dimension, so Mosaic keeps the tracer and weight resident in VMEM across
all Ny surfaces; each grid step evaluates a tile of 8 surfaces as masked
multiply-reduces over on-chip data (pure VPU work), and the sorted profile is
a scalar-prefetch operand read from SMEM.

Semantics are identical to diagnostics/lwa.py (reference core.py:696-905);
the surface mask uses the index form — for strictly monotone equivalent
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

_TJ = 32  # surfaces per grid step (4 f32 sublane tiles: measured ~7% faster
# than 8 — longer unrolled bodies give Mosaic more independent chains)


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


def _signed_term(qe, m, mask_inc: bool, part: str, part_inc: bool):
    """qe * mask(qe, m, mask_inc), the per-cell LWA integrand.

    For part='all' the 3-valued mask never needs materializing: with
    min(x,0) - x == -max(x,0) exactly in IEEE arithmetic,

        qe*mask = min(qe,0) - [~m]*qe    (mask_inc)
                = max(qe,0) - [~m]*qe    (not mask_inc)

    which is bit-identical to the select form at ~30% fewer vector ops
    (measured on the VPU-bound kernel).  Part selections keep the mask form;
    ``part_inc`` is the ORIGINAL increase flag — for variant2 the mask flips
    but part selection stays keyed on the original (reference core.py:860-872
    quirk).
    """
    if part == "all":
        ext = jnp.minimum(qe, 0.0) if mask_inc else jnp.maximum(qe, 0.0)
        return ext - jnp.where(m, 0.0, qe)
    return qe * _part_zero(_mask_value(qe, m, mask_inc), part, part_inc)


def _kernel(Qs_ref, q_ref, Qt_ref, W_ref, out_ref, *, increase: bool,
            part: str, variant2: bool, ny: int):
    b = pl.program_id(0)
    t = pl.program_id(2)
    q = q_ref[0]                      # (Ny, Nx), VMEM-resident across t
    W = W_ref[...]
    iy = jax.lax.broadcasted_iota(jnp.int32, (q.shape[0], 1), 0)
    qnan = jnp.isnan(q)

    def body(jj, _):
        j = t * _TJ + jj

        @pl.when(j < ny)
        def _():
            m = iy >= j
            if variant2:
                # qe = q(y_j, x) - Q(y): outer difference of one tracer row
                # against the sorted profile (core.py:860); Q arrives
                # pre-transposed (Ny, 1) so no lane->sublane relayout occurs
                qrow = q_ref[0, j, :]                   # (Nx,)
                Qcol = Qt_ref[0]                        # (Ny, 1)
                qe = qrow[None, :] - Qcol
                nan = jnp.isnan(qrow)[None, :] | jnp.isnan(Qcol)
                signed = _signed_term(qe, m, not increase, part, increase)
            else:
                Qj = Qs_ref[b, j]                       # SMEM scalar
                qe = q - Qj
                nan = qnan
                signed = _signed_term(qe, m, increase, part, increase)
            term = jnp.where(nan, 0.0, signed * W)
            out_ref[0, jj, :] = -jnp.sum(term, axis=0)
        return 0

    jax.lax.fori_loop(0, _TJ, body, 0, unroll=True)


# Per-operand budget for the snapshot block.  The kernel keeps q, W, and a
# few elementwise temporaries of the same shape live simultaneously, so this
# must be a small fraction of the 16 MB VMEM (measured: 4 MB blocks OOM at
# ~26 MB scoped usage on v5e).
_VMEM_BUDGET = 3 * 2 ** 19  # 1.5 MB
_YB = 256  # reduction rows per block in the tall-grid (y-blocked) kernel


def _kernel_yblocked(Qs_ref, qy_ref, qj_ref, Qt_ref, W_ref, out_ref, *,
                     increase: bool, part: str, variant2: bool, ny: int):
    """Tall-grid variant: the y reduction is split into _YB-row blocks that
    accumulate into the output tile (the innermost grid dimension), so VMEM
    holds only one (YB, nxb) panel regardless of Ny."""
    b = pl.program_id(0)
    t = pl.program_id(2)
    yb = pl.program_id(3)
    qy = qy_ref[0]                    # (YB, nxb) reduction rows
    W = W_ref[...]
    iy = (jax.lax.broadcasted_iota(jnp.int32, (qy.shape[0], 1), 0)
          + yb * _YB)
    qnan = jnp.isnan(qy)

    @pl.when(yb == 0)
    def _():
        out_ref[...] = jnp.zeros(out_ref.shape, out_ref.dtype)

    def body(jj, _):
        j = t * _TJ + jj

        @pl.when(j < ny)
        def _():
            valid_row = iy < ny       # y padding rows contribute nothing
            m = iy >= j
            if variant2:
                qrow = qj_ref[0, jj, :]               # surface row (nxb,)
                Qcol = Qt_ref[0]                      # (YB, 1) local block
                qe = qrow[None, :] - Qcol
                nan = jnp.isnan(qrow)[None, :] | jnp.isnan(Qcol)
                signed = _signed_term(qe, m, not increase, part, increase)
            else:
                Qj = Qs_ref[b, j]
                qe = qy - Qj
                nan = qnan
                signed = _signed_term(qe, m, increase, part, increase)
            term = jnp.where(nan | ~valid_row, 0.0, signed * W)
            out_ref[0, jj, :] += -jnp.sum(term, axis=0)
        return 0

    jax.lax.fori_loop(0, _TJ, body, 0, unroll=True)


@partial(jax.jit, static_argnames=("increase", "part", "variant2", "tile_j",
                                   "interpret"))
def lwa_pallas(q: jax.Array, Q: jax.Array, W: jax.Array, *, increase: bool,
               part: str = "all", variant2: bool = False, tile_j: int = 0,
               interpret: bool = False) -> jax.Array:
    """LWA on TPU via Pallas.

    q : (B, Ny, Nx) tracer;  Q : (B, Ny) sorted profile;  W : (Ny, Nx)
    composed weight (wei*dA or wei*dy).  Returns (B, Ny, Nx).
    (``tile_j`` is accepted for API stability; the surface tile is fixed at
    the f32 sublane width.)

    Grids whose (Ny, Nx) snapshot exceeds the VMEM budget are blocked along
    X — valid because every surface reduction is x-separable (the mask
    depends only on the row index) — with NaN x-padding that contributes
    nothing.
    """
    del tile_j
    B, Ny, Nx = q.shape
    ntj = pl.cdiv(Ny, _TJ)

    if Ny * 128 * q.dtype.itemsize > _VMEM_BUDGET:
        return _lwa_pallas_yblocked(q, Q, W, increase=increase, part=part,
                                    variant2=variant2, interpret=interpret)

    # choose an x block: whole row set if it fits, else 512-lane panels
    if Ny * Nx * q.dtype.itemsize <= _VMEM_BUDGET:
        nxb = Nx
    else:
        nxb = 512
        while Ny * nxb * q.dtype.itemsize > _VMEM_BUDGET and nxb > 128:
            nxb //= 2
    pad_x = (-Nx) % nxb
    if pad_x:
        q = jnp.concatenate(
            [q, jnp.full((B, Ny, pad_x), jnp.nan, q.dtype)], axis=-1)
        W = jnp.concatenate(
            [W, jnp.zeros((Ny, pad_x), W.dtype)], axis=-1)
    Nxp = Nx + pad_x
    n_xb = Nxp // nxb

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, n_xb, ntj),          # surface index innermost: q stays in VMEM
        in_specs=[
            pl.BlockSpec((1, Ny, nxb), lambda b, x, t, *_: (b, 0, x),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Ny, 1), lambda b, x, t, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Ny, nxb), lambda b, x, t, *_: (0, x),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, _TJ, nxb), lambda b, x, t, *_: (b, t, x)),
    )
    out = pl.pallas_call(
        partial(_kernel, increase=increase, part=part.lower(),
                variant2=variant2, ny=Ny),
        out_shape=jax.ShapeDtypeStruct((B, ntj * _TJ, Nxp), q.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(Q, q, Q[..., None], W)
    return out[:, :Ny, :Nx]


def _lwa_pallas_yblocked(q, Q, W, *, increase: bool, part: str,
                         variant2: bool, interpret: bool):
    """Tall-grid path: block the y reduction (see _kernel_yblocked)."""
    B, Ny, Nx = q.shape
    nxb = 512
    while _YB * nxb * q.dtype.itemsize > _VMEM_BUDGET and nxb > 128:
        nxb //= 2
    pad_x = (-Nx) % nxb
    pad_y = (-Ny) % max(_YB, _TJ)
    if pad_x:
        q = jnp.concatenate(
            [q, jnp.full((B, Ny, pad_x), jnp.nan, q.dtype)], axis=-1)
        W = jnp.concatenate([W, jnp.zeros((Ny, pad_x), W.dtype)], axis=-1)
    if pad_y:
        q = jnp.concatenate(
            [q, jnp.full((B, pad_y, q.shape[-1]), jnp.nan, q.dtype)], axis=1)
        W = jnp.concatenate(
            [W, jnp.zeros((pad_y, W.shape[-1]), W.dtype)], axis=0)
        Q = jnp.concatenate(
            [Q, jnp.zeros((B, pad_y), Q.dtype)], axis=1)
    Nyp = Ny + pad_y
    Nxp = Nx + pad_x
    ntj = Nyp // _TJ
    nyb = Nyp // _YB if Nyp % _YB == 0 else -(-Nyp // _YB)
    # pad y further so _YB divides
    extra = nyb * _YB - Nyp
    if extra:
        q = jnp.concatenate(
            [q, jnp.full((B, extra, Nxp), jnp.nan, q.dtype)], axis=1)
        W = jnp.concatenate([W, jnp.zeros((extra, Nxp), W.dtype)], axis=0)
        Q = jnp.concatenate([Q, jnp.zeros((B, extra), Q.dtype)], axis=1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, Nxp // nxb, ntj, nyb),  # yb innermost: out tile accumulates
        in_specs=[
            pl.BlockSpec((1, _YB, nxb), lambda b, x, t, y, *_: (b, y, x),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _TJ, nxb), lambda b, x, t, y, *_: (b, t, x),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _YB, 1), lambda b, x, t, y, *_: (b, y, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_YB, nxb), lambda b, x, t, y, *_: (y, x),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, _TJ, nxb), lambda b, x, t, y, *_: (b, t, x)),
    )
    out = pl.pallas_call(
        partial(_kernel_yblocked, increase=increase, part=part.lower(),
                variant2=variant2, ny=Ny),
        out_shape=jax.ShapeDtypeStruct((B, ntj * _TJ, Nxp), q.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(Q, q, q, Q[..., None], W)
    return out[:, :Ny, :Nx]
