"""Device-mesh construction and sharding helpers.

The reference has no distributed backend at all — its only parallelism is
dask chunking over batch dims (SURVEY.md §2.4).  Here scaling is native JAX
SPMD: a 2-D ('batch', 'x') mesh where the snapshot batch rides the slower
axis (DCN across hosts) and the grid's X dimension is sharded across ICI
neighbors.  Every pipeline is pure, so sharding is applied by annotating the
inputs (GSPMD inserts the psum/all-gather collectives) or explicitly via
shard_map for the histogram reduction (parallel/histogram.py).
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              axis_names: Sequence[str] = ("batch", "x"),
              x_size: Optional[int] = None) -> Mesh:
    """Build a ('batch', 'x') mesh over the first ``n_devices`` devices.

    ``x_size`` (spatial shards) defaults to 2 when the device count is even,
    else 1 — batch parallelism is the primary axis for this workload since
    snapshots are embarrassingly parallel (SURVEY.md §2.4).
    """
    devs = jax.devices()
    n = len(devs) if n_devices is None else n_devices
    devs = devs[:n]
    if x_size is None:
        x_size = 2 if n % 2 == 0 and n >= 2 else 1
    if n % x_size:
        raise ValueError(f"{n} devices not divisible by x_size={x_size}")
    arr = np.asarray(devs).reshape(n // x_size, x_size)
    return Mesh(arr, axis_names)


def make_hybrid_mesh(axis_names: Sequence[str] = ("batch", "x"),
                     x_size: Optional[int] = None) -> Mesh:
    """Multi-host ('batch', 'x') mesh: batch rides DCN, x rides ICI.

    On a multi-host pod slice (``jax.process_count() > 1``) the batch axis
    must map to the slow inter-host network and the spatial axis to in-host
    ICI neighbors; ``mesh_utils.create_hybrid_device_mesh`` places devices so
    each host's local devices form the ICI ('x') groups.  Snapshots are
    embarrassingly parallel, so the batch axis tolerates DCN latency; the
    histogram psum and length reductions stay on ICI (SURVEY.md §2.4, §5).

    Single-process (this image, tests, the virtual CPU mesh) reduces exactly
    to :func:`make_mesh` over all visible devices.
    """
    n_proc = jax.process_count()
    if n_proc <= 1:
        return make_mesh(axis_names=axis_names, x_size=x_size)
    from jax.experimental import mesh_utils

    local = jax.local_device_count()
    if x_size is None:
        x_size = local            # whole-host ICI groups by default
    if local % x_size:
        raise ValueError(f"{local} local devices not divisible by "
                         f"x_size={x_size}")
    n = len(jax.devices())
    arr = mesh_utils.create_hybrid_device_mesh(
        mesh_shape=(local // x_size, x_size),
        dcn_mesh_shape=(n_proc, 1))      # hosts along the batch axis only
    assert arr.shape == (n // x_size, x_size)
    return Mesh(arr, axis_names)


def shard_batch_spec(mesh: Mesh, ndim: int, batch_axis: str = "batch",
                     x_axis: str = "x") -> NamedSharding:
    """Sharding for a (..., Ny, Nx) field batch: leading axis over ``batch``,
    the last (X) axis over ``x``; Ny replicated (the equivalent dimension is
    reduced over in every diagnostic, so splitting it would put the heavy
    LWA reduction across ICI for no benefit)."""
    spec = [None] * ndim
    if ndim >= 3:
        spec[0] = batch_axis
    spec[-1] = x_axis
    return NamedSharding(mesh, P(*spec))
