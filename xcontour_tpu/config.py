"""Runtime configuration: kernel backend selection.

Pallas kernels are used automatically when the default JAX backend is a TPU;
tests and CPU runs use the pure-XLA paths (every Pallas kernel has an
XLA twin validated against it).  Override with :func:`set_use_pallas` or the
``XCONTOUR_USE_PALLAS`` environment variable (``1``/``0``).
"""

from __future__ import annotations

import os
from typing import Optional

import jax

_OVERRIDE: Optional[bool] = None


def set_use_pallas(value: Optional[bool]) -> None:
    """Force Pallas kernels on/off; None restores auto-detection.

    Jitted entry points read this flag at trace time, so a flip that
    changes the effective backend invalidates every cached trace — the
    caches are cleared here (cheap relative to the silent alternative:
    reusing a trace that contains the other backend's kernels)."""
    global _OVERRIDE
    old = use_pallas()
    _OVERRIDE = value
    if use_pallas() != old:
        jax.clear_caches()


def use_pallas() -> bool:
    if _OVERRIDE is not None:
        return _OVERRIDE
    env = os.environ.get("XCONTOUR_USE_PALLAS")
    if env is not None:
        return env not in ("0", "false", "False")
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


import contextlib


@contextlib.contextmanager
def use_pallas_scope(value: Optional[bool]):
    """Temporarily force Pallas kernels on/off within a block."""
    prev = _OVERRIDE
    set_use_pallas(value)
    try:
        yield
    finally:
        set_use_pallas(prev)


_LWA_FAST_OVERRIDE: Optional[bool] = None


def set_lwa_fast(value: Optional[bool]) -> None:
    """Allow/forbid the O(Ny log Ny) sort-merge LWA path in 'auto' method
    resolution (selected only above the measured Ny crossover; part='all'
    only); None restores the default (allowed).  Exact path control is the
    ``method`` kwarg on the LWA entry points.

    Clears the jit caches when the effective value changes, for the same
    reason as :func:`set_use_pallas`: 'auto' resolves at trace time, and a
    cached trace embeds the previously-resolved path."""
    global _LWA_FAST_OVERRIDE
    old = lwa_fast()
    _LWA_FAST_OVERRIDE = value
    if lwa_fast() != old:
        jax.clear_caches()


def lwa_fast() -> bool:
    if _LWA_FAST_OVERRIDE is not None:
        return _LWA_FAST_OVERRIDE
    env = os.environ.get("XCONTOUR_LWA_FAST")
    if env is not None:
        return env not in ("0", "false", "False")
    return True
