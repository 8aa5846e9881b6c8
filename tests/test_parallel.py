"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from xcontour_tpu.parallel import make_mesh, shard_batch_spec, sharded_weighted_cdf
from xcontour_tpu.ops.histogram import weighted_cdf
from xcontour_tpu.pipeline import keff_lwa_pipeline
from xcontour_tpu import grid as G


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    return make_mesh(8)


def test_sharded_cdf_matches_single(mesh, rng):
    B, Ny, Nx = 8, 32, 64
    v = rng.normal(size=(B, Ny, Nx)).astype(np.float64)
    w = rng.uniform(0.5, 2.0, size=(Ny, Nx)).astype(np.float64)
    bins = np.linspace(v.min(), v.max(), 21)
    tr = jax.device_put(jnp.asarray(v), shard_batch_spec(mesh, 3))
    got = sharded_weighted_cdf(tr, jnp.asarray(bins), jnp.asarray(w), True, mesh)
    want = weighted_cdf(jnp.asarray(v), jnp.asarray(bins), jnp.asarray(w), True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-12)


def test_sharded_pipeline_matches_unsharded(mesh, rng):
    """GSPMD: the full combined Keff+LWA step gives identical results when its
    inputs are sharded (batch x spatial) over the mesh."""
    Ny, Nx = 24, 48
    lat = np.linspace(-80, 80, Ny)
    lon = np.linspace(0, 360 - 360 / Nx, Nx)
    grid = G.from_latlon(lat, lon, dtype=jnp.float64)
    B = 8
    tracer = (np.sin(np.deg2rad(lat))[None, :, None]
              + 0.1 * rng.standard_normal((B, Ny, Nx)))
    plain = keff_lwa_pipeline(jnp.asarray(tracer), grid, N=11,
                              increase=True, lt=True, lmin="analytic")
    tr = jax.device_put(jnp.asarray(tracer), shard_batch_spec(mesh, 3))
    shard = keff_lwa_pipeline(tr, grid, N=11, increase=True, lt=True,
                              lmin="analytic")
    for k in ("intArea", "Yeq", "Leq2", "lwa"):
        np.testing.assert_allclose(np.asarray(shard[k]), np.asarray(plain[k]),
                                   rtol=1e-9, atol=1e-12, equal_nan=True,
                                   err_msg=k)


def test_graft_entry_dryrun():
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)


def test_sharded_stencil_matches_local(mesh, rng):
    """Explicit ppermute halo exchange reproduces the single-device stencil."""
    from xcontour_tpu.parallel.stencil import sharded_squared_gradient
    from xcontour_tpu.ops.stencil import squared_gradient
    Ny, Nx = 24, 64
    lat = np.linspace(-80, 80, Ny)
    lon = np.linspace(0, 360 - 360 / Nx, Nx)
    grid = G.from_latlon(lat, lon, dtype=jnp.float64)
    q = rng.normal(size=(8, Ny, Nx))
    tr = jax.device_put(jnp.asarray(q), shard_batch_spec(mesh, 3))
    got = sharded_squared_gradient(tr, grid, mesh)
    want = squared_gradient(jnp.asarray(q), grid)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-12)


def test_sharded_lwa_matches_local(mesh, rng):
    """X-sharded LWA is communication-free and exact: each device reduces its
    own longitude slab (the weight normalization max(dA) must still be global,
    so dA is passed whole and sliced by shard_map)."""
    from xcontour_tpu.parallel.lwa import sharded_local_wave_activity
    from xcontour_tpu.diagnostics.lwa import local_wave_activity
    B, Ny, Nx = 8, 16, 32
    ydef = np.linspace(-60, 60, Ny)
    q = rng.normal(size=(B, Ny, Nx))
    dA = rng.uniform(0.5, 2.0, size=(Ny, Nx))  # x-varying: exposes any
    # per-shard (instead of global) max(dA) normalization bug
    Q = np.sort(rng.normal(size=(B, Ny)), axis=-1)
    tr = jax.device_put(jnp.asarray(q), shard_batch_spec(mesh, 3))
    got = sharded_local_wave_activity(tr, jnp.asarray(Q), jnp.asarray(dA),
                                      jnp.asarray(ydef), mesh, increase=True)
    want = local_wave_activity(jnp.asarray(q), jnp.asarray(Q), jnp.asarray(dA),
                               jnp.asarray(ydef), increase=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-12)
