"""Local finite-amplitude wave activity (LWA / FAWA / LAPE) kernels.

Reference semantics: /root/reference/xcontour/core.py:696-905.  The reference
loops a Python ``for j in range(Ny)`` over equivalent-dimension surfaces, each
iteration building full-grid temporaries and a full-grid reduction — O(Ny^2*Nx)
with xarray overhead per step.  Here the j-loop becomes a chunked
``lax.map``-of-``vmap``: each chunk of surfaces is evaluated as one fused XLA
elementwise+reduction kernel, so the arithmetic streams from HBM at full
bandwidth and nothing is ever materialized at O(Ny^2*Nx).

Conventions: fields are (..., Ny, Nx) with the equivalent dim at axis -2;
sorted profiles Q are (..., Ny).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _mask3(qe, m, increase: bool):
    """3-valued LWA mask (core.py:759-766): -1 where the tracer deviation
    pokes out equatorward/below of the contour, +1 poleward/above, 0 else."""
    if increase:
        mask1 = jnp.where(qe > 0, -1.0, 0.0)
        mask2 = jnp.where(m, 0.0, mask1)
        return jnp.where((qe < 0) & m, 1.0, mask2)
    mask1 = jnp.where(qe < 0, -1.0, 0.0)
    mask2 = jnp.where(m, 0.0, mask1)
    return jnp.where((qe > 0) & m, 1.0, mask2)


def _part_select(mask3, part: str, increase: bool):
    """W+/W-/all selection (core.py:772-784); NaN marks 'excluded'."""
    if part == "all":
        return mask3
    if part == "upper":
        keep = mask3 > 0 if increase else mask3 < 0
    elif part == "lower":
        keep = mask3 < 0 if increase else mask3 > 0
    else:
        raise ValueError("part must be in ['all', 'upper', 'lower']")
    return jnp.where(keep, mask3, jnp.nan)


def _pallas_ok(q) -> bool:
    """Use the Pallas kernel when on TPU and the narrowest (Ny x 128) column
    panel fits the kernel's VMEM budget (it blocks along X for wide grids;
    taller grids than that would need Y blocking — ROADMAP)."""
    from .. import config
    from ..kernels.lwa_pallas import _VMEM_BUDGET
    Ny = q.shape[-2]
    return config.use_pallas() and (Ny * 128 * q.dtype.itemsize) <= _VMEM_BUDGET


def _lwa_via_pallas(q, Q, W, increase: bool, part: str, variant2: bool):
    from ..kernels.lwa_pallas import lwa_pallas
    batch = q.shape[:-2]
    Ny, Nx = q.shape[-2:]
    qf = q.reshape((-1, Ny, Nx))
    Qf = jnp.broadcast_to(Q, batch + (Ny,)).reshape((-1, Ny))
    W = jnp.broadcast_to(W, (Ny, Nx))
    out = lwa_pallas(qf, Qf, W, increase=increase, part=part,
                     variant2=variant2)
    return out.reshape(batch + (Ny, Nx))


def _chunked_over_surfaces(fn, Ny: int, chunk: int):
    """Evaluate fn(j_indices_vector) for j = 0..Ny-1 in vmapped chunks via
    lax.map, limiting peak memory to chunk * field size."""
    chunk = max(1, min(chunk, Ny))
    npad = (-Ny) % chunk
    idx = jnp.arange(Ny + npad).reshape(-1, chunk)
    out = jax.lax.map(jax.vmap(fn), idx)          # (nchunk, chunk, ..., Nx)
    out = out.reshape((-1,) + out.shape[2:])[:Ny]  # (Ny, ..., Nx)
    return out


@partial(jax.jit, static_argnames=("increase", "part", "chunk"))
def local_wave_activity(q, Q, dA, ydef, *, increase: bool, part: str = "all",
                        chunk: int = 16, weight=None):
    """LWA (Huang-Nakamura 2016), reference core.py:696-799.

    q : (..., Ny, Nx) tracer;  Q : (..., Ny) sorted profile on ydef;
    dA : (Ny, Nx) cell areas;  ydef : (Ny,).
    Returns LWA (..., Ny, Nx): surface index j along axis -2.

    ``weight`` is the composed integration weight W(y, x); the default
    reproduces the reference's wei*dA with wei = dA/max(dA)
    (core.py:723-724, 789).  Pass wei*dy (the meridional line element) for the
    physically-united m/s form the reference's commented-out metric intends
    (core.py:787-788, SURVEY.md §0.2).
    """
    part = part.lower()
    wei_dA = dA / jnp.nanmax(dA) * dA if weight is None else weight
    if _pallas_ok(q):
        return _lwa_via_pallas(q, Q, wei_dA, increase, part, False)
    coord_incre = ydef[-1] > ydef[0]

    def one(j):
        Qj = jnp.take(Q, j, axis=-1)
        yj = ydef[j]
        qe = q - Qj[..., None, None]
        m = jnp.where(coord_incre, ydef >= yj, ydef <= yj)[:, None]
        mask = _part_select(_mask3(qe, m, increase), part, increase)
        return -jnp.nansum(qe * mask * wei_dA, axis=-2)

    lwa = _chunked_over_surfaces(one, ydef.shape[0], chunk)  # (Ny, ..., Nx)
    return jnp.moveaxis(lwa, 0, -2)


@partial(jax.jit, static_argnames=("increase", "part", "chunk"))
def local_wave_activity2(q, Q, dA, ydef, *, increase: bool, part: str = "all",
                         chunk: int = 16, weight=None):
    """Impulse-Casimir variant (core.py:802-905): qe = q_j - Q, mask branches
    swapped (core.py:865-872) while part selection keys off the original
    ``increase`` flag (core.py:879-890).  ``weight`` as in
    :func:`local_wave_activity`."""
    part = part.lower()
    wei_dA = dA / jnp.nanmax(dA) * dA if weight is None else weight
    if _pallas_ok(q):
        return _lwa_via_pallas(q, Q, wei_dA, increase, part, True)
    coord_incre = ydef[-1] > ydef[0]

    def one(j):
        qj = jnp.take(q, j, axis=-2)                      # (..., Nx)
        qe = qj[..., None, :] - Q[..., :, None]           # (..., Ny, Nx)
        yj = ydef[j]
        m = jnp.where(coord_incre, ydef >= yj, ydef <= yj)[:, None]
        mask = _part_select(_mask3(qe, m, not increase), part, increase)
        return -jnp.nansum(qe * mask * wei_dA, axis=-2)

    lwa = _chunked_over_surfaces(one, ydef.shape[0], chunk)
    return jnp.moveaxis(lwa, 0, -2)


def lwa_masks_at(q, Q, dA, ydef, mask_idx, *, increase: bool,
                 variant2: bool = False):
    """Masks and contour values at selected surface indices, for plotting
    parity with the reference's ``mask_idx`` outputs (core.py:768-770).
    Returns (contours (..., K), masks (K, ..., Ny, Nx))."""
    coord_incre = ydef[-1] > ydef[0]
    idx = jnp.asarray(mask_idx)

    def one(j):
        if variant2:
            qj = jnp.take(q, j, axis=-2)
            qe = qj[..., None, :] - Q[..., :, None]
            inc = not increase
        else:
            Qj = jnp.take(Q, j, axis=-1)
            qe = q - Qj[..., None, None]
            inc = increase
        yj = ydef[j]
        m = jnp.where(coord_incre, ydef >= yj, ydef <= yj)[:, None]
        return _mask3(qe, m, inc)

    masks = jax.vmap(one)(idx)
    contours = jnp.take(Q, idx, axis=-1)
    return contours, masks
