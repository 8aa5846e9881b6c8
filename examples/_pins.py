"""Shared golden-pin helper for the examples.

Each example pins 2-3 numerical statistics against values recorded from the
committed deterministic fixtures, with tolerance bands sized to cross-backend
f32 noise — a silent scale/sign regression fails `make examples` even though
the plot would still render.  Set ``XC_EX_COLLECT=1`` to print values without
asserting (pin-collection mode, used when re-recording after an intentional
fixture change).
"""

import os

# absolute floor on the tolerance band: a pin recorded at/near 0.0 would get
# a zero-width purely-relative band and fail on harmless f32 noise (ADVICE
# r4 #4).  Sized to f32 round-off around order-1 statistics; pins with
# larger natural scales are dominated by their relative term anyway.
_ATOL = 1e-6


def _pin(name, got, want, rtol, atol=_ATOL):
    print(f"[pin] {name} = {got:.7g} (expect {want} within {rtol:g})")
    if os.environ.get("XC_EX_COLLECT"):        # pin-collection mode
        return
    assert want is not None and \
        abs(got - want) <= rtol * abs(want) + atol, \
        f"golden pin {name}: got {got!r}, pinned {want!r} " \
        f"(rtol {rtol}, atol {atol})"
