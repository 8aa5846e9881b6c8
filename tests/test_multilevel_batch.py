"""Multi-dimensional batch axes: (time, level, Ny, Nx) through every path.

The reference handles extra dims via xarray broadcasting and notes its hist
path 'does not support multi-dimensional calculation well'
(tests/test_Keff_atmos.py:72-74); here arbitrary leading axes are native.
"""

import numpy as np
import pytest
import jax.numpy as jnp

pytestmark = pytest.mark.slow

from xcontour_tpu import grid as G
from xcontour_tpu.pipeline import keff_lwa_pipeline
from xcontour_tpu.utils import synth


def test_time_by_level_batch():
    v, _ = synth.synth_pv(nlev=3, nlat=46, nlon=72)
    grid = G.from_latlon(v["latitude"], v["longitude"], dtype=jnp.float64)
    pv = np.asarray(v["pv"], np.float64)                      # (L, Ny, Nx)
    stack = np.stack([pv, pv * 1.01])                          # (T, L, Ny, Nx)

    out = keff_lwa_pipeline(jnp.asarray(stack), grid, N=31, increase=True,
                            lt=True, lmin="analytic")
    assert out["nkeff"].shape == (2, 3, 31)
    assert out["lwa"].shape == (2, 3, 46, 72)

    # every (t, l) element equals its own single-snapshot run
    for t in range(2):
        for l in range(3):
            one = keff_lwa_pipeline(jnp.asarray(stack[t, l]), grid, N=31,
                                    increase=True, lt=True, lmin="analytic")
            np.testing.assert_allclose(np.asarray(out["Yeq"][t, l]),
                                       np.asarray(one["Yeq"]), rtol=1e-10,
                                       atol=1e-10)
            np.testing.assert_allclose(np.asarray(out["lwa"][t, l]),
                                       np.asarray(one["lwa"]), rtol=1e-9,
                                       atol=1e-9)
