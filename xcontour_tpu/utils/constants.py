"""Physical constants shared across the library.

Semantics mirror the reference implementation (/root/reference/xcontour/utils.py:18-30):
Earth radius, gravitational acceleration, rotation rate, and the degree->meter
conversion at the equator.  All are plain Python floats so they stay weakly
typed under JAX and never force a dtype promotion.
"""

import math

# Radius of the Earth (m) — reference utils.py:19
Rearth = 6371200.0

# Gravitational acceleration (m s^-2) — reference utils.py:27
g = 9.80665

# Rotation angular speed of the Earth (s^-1) — reference utils.py:30
omega = 7.292e-5


def deg2m(Rearth: float = Rearth) -> float:
    """Distance of one degree of arc at the equator (m) — reference utils.py:22-24."""
    return 2.0 * math.pi * Rearth / 360.0
