"""Fractal dimension from multi-scale contour lengths.

Implements the reference fractal workflow (tests/test_fractal.py:54-115):
contour lengths measured at a ladder of rulers (grid coarsenings and/or
box-counting strides), then the log-log slope  D = d log(L/ruler) / d(-log
ruler)  fitted per contour.  The fit is a closed-form least squares along the
stride axis (replacing the reference's per-element np.polyfit apply_ufunc
loop), NaN-aware like the reference's try/except polyfit wrapper
(tests/test_fractal.py:90-96).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.jit
def loglog_slope(x: jax.Array, y: jax.Array) -> jax.Array:
    """Least-squares slope of y against x along the last axis, ignoring
    non-finite pairs; NaN when fewer than 2 valid points."""
    valid = jnp.isfinite(x) & jnp.isfinite(y)
    xv = jnp.where(valid, x, 0.0)
    yv = jnp.where(valid, y, 0.0)
    n = jnp.sum(valid, axis=-1)
    sx = jnp.sum(xv, axis=-1)
    sy = jnp.sum(yv, axis=-1)
    sxx = jnp.sum(xv * xv, axis=-1)
    sxy = jnp.sum(xv * yv, axis=-1)
    denom = n * sxx - sx * sx
    slope = (n * sxy - sx * sy) / jnp.where(denom == 0, 1.0, denom)
    return jnp.where((n >= 2) & (denom != 0), slope, jnp.nan)


def fractal_dimension(lengths: jax.Array, rulers: jax.Array) -> jax.Array:
    """Box-counting dimension per contour.

    lengths : (..., S) contour lengths at S ruler scales;
    rulers : broadcastable to lengths — physical ruler size per scale
    (tests/test_fractal.py:105: stride * cos(lat) * resolution * R).
    D = slope of log(L/ruler) vs -log(ruler)  (tests/test_fractal.py:107-115).
    """
    rulers = jnp.broadcast_to(rulers, lengths.shape)
    counts = lengths / rulers
    return loglog_slope(-jnp.log(rulers), jnp.log(counts))
