"""Derivative along the uniform contour index.

xarray's ``.differentiate('contour')`` on the 0..N-1 contour coordinate
(/root/reference/xcontour/core.py:479-483) is second-order centered in the
interior with one-sided edges — i.e. ``np.gradient`` with unit spacing.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gradient_index(var: jax.Array, axis: int = -1) -> jax.Array:
    """np.gradient(var, axis=axis) with unit spacing, in jnp."""
    v = jnp.moveaxis(var, axis, -1)
    interior = (v[..., 2:] - v[..., :-2]) * 0.5
    first = (v[..., 1:2] - v[..., 0:1])
    last = (v[..., -1:] - v[..., -2:-1])
    out = jnp.concatenate([first, interior, last], axis=-1)
    return jnp.moveaxis(out, -1, axis)
