"""Pallas TPU kernel for the |grad q|^2 stencil.

A 5-point centered-difference stencil over a VMEM-resident snapshot: the
x-shifts are lane rolls (periodic wrap for free), the y-shifts sublane rolls
with wall columns patched per the boundary condition.  One read of q, one
write of the result — the XLA version materializes the rolled copies through
HBM.  Falls back to the XLA path for snapshots over the VMEM budget (the
stencil is a minor cost at those sizes anyway).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_BUDGET = 3 * 2 ** 19  # per-operand, as in lwa_pallas


def _kernel(q_ref, dx_ref, dy_ref, out_ref, *, periodic_x: bool, bc_y: str):
    q = q_ref[0]                       # (Ny, Nx)
    Ny, Nx = q.shape

    # x: centered via lane rolls; non-periodic walls become one-sided
    left = pltpu.roll(q, 1, 1)
    right = pltpu.roll(q, Nx - 1, 1)   # shift must be non-negative
    qx = (right - left) * 0.5
    if not periodic_x:
        ix = jax.lax.broadcasted_iota(jnp.int32, (Ny, Nx), 1)
        qx = jnp.where(ix == 0, right - q, qx)
        qx = jnp.where(ix == Nx - 1, q - left, qx)

    # y: centered via sublane rolls; walls per bc
    up = pltpu.roll(q, 1, 0)           # row j-1 at row j
    dn = pltpu.roll(q, Ny - 1, 0)      # row j+1 at row j (non-negative shift)
    qy = (dn - up) * 0.5
    iy = jax.lax.broadcasted_iota(jnp.int32, (Ny, Nx), 0)
    if bc_y == "extend":
        qy = jnp.where(iy == 0, dn - q, qy)
        qy = jnp.where(iy == Ny - 1, q - up, qy)
    elif bc_y == "fill":  # zero ghost rows
        qy = jnp.where(iy == 0, dn * 0.5, qy)
        qy = jnp.where(iy == Ny - 1, -up * 0.5, qy)
    else:  # reflect: zero wall-normal derivative
        qy = jnp.where((iy == 0) | (iy == Ny - 1), 0.0, qy)

    # operands arrive as reciprocals: VPU divides cost several passes of
    # Newton refinement, multiplies are single ops
    gx = qx * dx_ref[...]
    gy = qy * dy_ref[...]
    out_ref[0] = gx * gx + gy * gy


@partial(jax.jit, static_argnames=("periodic_x", "bc_y", "interpret"))
def squared_gradient_pallas(q: jax.Array, dx: jax.Array, dy_col: jax.Array, *,
                            periodic_x: bool, bc_y: str = "extend",
                            interpret: bool = False) -> jax.Array:
    """q: (B, Ny, Nx); dx: (Ny, Nx) physical x spacings; dy_col: (Ny, 1)
    physical y spacings.  Returns |grad q|^2 (B, Ny, Nx)."""
    B, Ny, Nx = q.shape
    dx = 1.0 / dx
    dy2d = jnp.broadcast_to(1.0 / dy_col, (Ny, Nx))
    return pl.pallas_call(
        partial(_kernel, periodic_x=periodic_x, bc_y=bc_y),
        out_shape=jax.ShapeDtypeStruct((B, Ny, Nx), q.dtype),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, Ny, Nx), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Ny, Nx), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Ny, Nx), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, Ny, Nx), lambda b: (b, 0, 0)),
        interpret=interpret,
    )(q, dx, dy2d)


def pallas_ok(q) -> bool:
    from .. import config
    Ny, Nx = q.shape[-2:]
    return config.use_pallas() and (Ny * Nx * q.dtype.itemsize) <= _VMEM_BUDGET
