"""Vectorized monotone 1-D interpolation.

Replaces the reference's per-batch Python loop over ``np.interp``
(apply_ufunc(vectorize=True) at /root/reference/xcontour/core.py:1161-1169 and
:1091-1098) with a vmapped ``jnp.interp``.  Decreasing abscissae are handled by
reversal, exactly like the reference ``_interp1d`` (core.py:1405-1434);
out-of-range queries clamp to the endpoints (np.interp semantics).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _interp_single(x, xf, yf, inc, extrapolate):
    xf2 = jnp.where(inc, xf, xf[::-1])
    yf2 = jnp.where(inc, yf, yf[::-1])
    out = jnp.interp(x, xf2, yf2)
    if extrapolate == "nan":
        out = jnp.where((x < xf2[0]) | (x > xf2[-1]), jnp.nan, out)
    return out


def interp1d(x: jax.Array, xf: jax.Array, yf: jax.Array,
             increasing=None, extrapolate: str = "clamp") -> jax.Array:
    """Batched np.interp with direction handling.

    ``x``: (..., M) or (M,) query points; ``xf``/``yf``: (..., N) data points.
    ``increasing``: direction of ``xf``; None derives it per batch element, a
    bool/traced scalar applies one direction globally (the reference derives it
    from the first batch element — pass that in for exact parity).
    ``extrapolate``: 'clamp' (np.interp endpoint clamping, the reference's
    _interp1d behavior) or 'nan' (xarray-style NaN outside the data range).
    Batch dims of all arguments broadcast together.
    """
    # broadcast batch dims
    xb = x.shape[:-1] if x.ndim > 1 else ()
    batch = jnp.broadcast_shapes(xb, xf.shape[:-1], yf.shape[:-1])
    M = x.shape[-1]
    N = xf.shape[-1]
    x2 = jnp.broadcast_to(x, batch + (M,)).reshape((-1, M))
    xf2 = jnp.broadcast_to(xf, batch + (N,)).reshape((-1, N))
    yf2 = jnp.broadcast_to(yf, batch + (N,)).reshape((-1, N))

    if increasing is None:
        inc = xf2[:, -1] > xf2[:, 0]
    else:
        inc = jnp.broadcast_to(jnp.asarray(increasing), (x2.shape[0],))

    out = jax.vmap(_interp_single, in_axes=(0, 0, 0, 0, None))(
        x2, xf2, yf2, inc, extrapolate)
    return out.reshape(batch + (M,))
