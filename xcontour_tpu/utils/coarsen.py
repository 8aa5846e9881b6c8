"""Block-coarsening of plane fields.

Stands in for the external ``utils.XarrayUtils.coarsen`` helper the reference
fractal driver imports (tests/test_fractal.py:60-70): block-mean the last two
axes by an integer ratio (NaN-skipping, like xarray's coarsen(...).mean()).
"""

from __future__ import annotations

import jax.numpy as jnp


def coarsen(field, ratio: int):
    """Block-average the trailing (Ny, Nx) axes by ``ratio``.

    Ny and Nx must be divisible by ratio (true for all bundled fixture grids
    with the reference's power-of-two strides).  NaNs are skipped; all-NaN
    blocks yield NaN.
    """
    if ratio == 1:
        return field
    *batch, ny, nx = field.shape
    if ny % ratio or nx % ratio:
        raise ValueError(f"grid {ny}x{nx} not divisible by ratio {ratio}")
    blocks = field.reshape(*batch, ny // ratio, ratio, nx // ratio, ratio)
    good = ~jnp.isnan(blocks)
    s = jnp.nansum(blocks, axis=(-3, -1))
    n = jnp.sum(good, axis=(-3, -1))
    return jnp.where(n > 0, s / jnp.maximum(n, 1), jnp.nan)
