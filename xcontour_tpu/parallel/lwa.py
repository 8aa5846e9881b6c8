"""Explicitly sharded LWA: pure spatial data parallelism over the X axis.

The LWA surface reduction runs along Y with weights local to each column, so
an X-sharded field needs NO communication at all — each device computes the
LWA of its own longitude slab (SURVEY.md §2.4: the spatial-decomposition
axis).  The sorted profile Q and the coordinate vector are replicated (they
are O(Ny)).  This is the collective-free shard_map twin of what GSPMD derives
for the jit path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..diagnostics import lwa as _lwa


def sharded_local_wave_activity(q, Q, dA, ydef, mesh: Mesh, *,
                                increase: bool, part: str = "all",
                                batch_axis: str = "batch", x_axis: str = "x"):
    """q: (B, Ny, Nx) sharded (batch, -, x); Q: (B, Ny) replicated over x;
    dA: (Ny, Nx) sharded along x; ydef: (Ny,) replicated.
    Returns LWA (B, Ny, Nx) with the same sharding as q."""

    # the wei = dA/max(dA) normalization needs the GLOBAL area maximum
    # (core.py:723-724); compose the weight before sharding so each slab
    # carries the right normalization
    weight = dA / jnp.nanmax(dA) * dA

    def local(qs, Qs, ws):
        return _lwa.local_wave_activity(qs, Qs, ws, ydef,
                                        increase=increase, part=part,
                                        weight=ws)

    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(batch_axis, None, x_axis), P(batch_axis, None),
                  P(None, x_axis)),
        out_specs=P(batch_axis, None, x_axis))
    return fn(q, Q, weight)
