"""Small untested surfaces found by the round-5 coverage sweep.

Each test pins a real contract (error branches, fallback paths, helpers)
that the main workload tests never reach: pipeline config-error messages,
the keff_lwa dxF Lmin branch, flatten_output passthrough leaves, the
checkify finite guard, the sharded-stencil shard-width guard, viz's
NaN-Yeq coordinate repair, and the tiny util helpers.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from xcontour_tpu import grid as G
from xcontour_tpu import pipeline


def _tiny_grid(nx=16, ny=12, lon_end=355.0):
    lat = np.linspace(-60.0, 60.0, ny)
    lon = np.linspace(0.0, lon_end, nx)
    return G.from_latlon(lat, lon, dtype=jnp.float64)


def _tiny_tracer(rng, ny=12, nx=16):
    return jnp.asarray(np.sin(np.linspace(0, 3, ny))[:, None]
                       + 0.05 * rng.standard_normal((ny, nx)))


def test_keff_pipeline_unknown_lmin_raises(rng):
    grid = _tiny_grid()
    tr = _tiny_tracer(rng)
    with pytest.raises(ValueError, match="unknown lmin mode"):
        pipeline.keff_pipeline(tr, grid, N=11, lmin="bogus")


def test_lwa_pipeline_unknown_metric_raises(rng):
    grid = _tiny_grid()
    tr = _tiny_tracer(rng)
    with pytest.raises(ValueError, match="unknown LWA metric"):
        pipeline.lwa_pipeline(tr, grid, N=11, metric="bogus")


def test_keff_lwa_pipeline_unknown_lmin_raises(rng):
    grid = _tiny_grid()
    tr = _tiny_tracer(rng)
    with pytest.raises(ValueError, match="unknown lmin mode"):
        pipeline.keff_lwa_pipeline(tr, grid, N=11, lmin="bogus")


def test_keff_lwa_pipeline_lmin_dxf_matches_keff_pipeline(rng):
    """The combined pipeline's numeric-Lmin branch (masked dxF zonal sum,
    the ocean-driver convention, reference tests/test_Keff_ocean.py:59-65)
    must agree with keff_pipeline's tested dxF branch."""
    grid = _tiny_grid()
    tr = _tiny_tracer(rng)
    combined = pipeline.keff_lwa_pipeline(tr, grid, N=11, lmin="dxF")
    keff_only = pipeline.keff_pipeline(tr, grid, N=11, lmin="dxF")["origin"]
    np.testing.assert_allclose(np.asarray(combined["Lmin"]),
                               np.asarray(keff_only["Lmin"]), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(combined["nkeff"]),
                               np.asarray(keff_only["nkeff"]), rtol=1e-12)


def test_flatten_output_passes_plain_leaves_and_drops_tables(rng):
    tbl_like = type("T", (), {"lookup_coordinates": lambda self: None})()
    arr = jnp.arange(4.0)
    out = pipeline.flatten_output(
        {"nkeff": arr, "table": tbl_like, "scalarless": "meta",
         "origin": {"Q": arr}, "interp": {"Lmin": arr},
         "extra": {"x": arr}})
    assert set(out) == {"nkeff", "Q", "Lmin_at", "extra_x"}
    np.testing.assert_array_equal(np.asarray(out["nkeff"]), np.arange(4.0))


def test_check_finite_bound():
    from xcontour_tpu.utils import checks

    def step(x):
        checks.check_finite(x, "field", allow_nan_frac=0.3)
        return x * 2

    ok = jnp.asarray([1.0, jnp.nan, 3.0, 4.0])        # 25% non-finite
    err, _ = checks.checked(step)(ok)
    err.throw()                                        # under the bound
    bad = jnp.asarray([1.0, jnp.nan, jnp.inf, 4.0])    # 50% non-finite
    err, _ = checks.checked(step)(bad)
    with pytest.raises(Exception, match="non-finite fraction exceeds"):
        err.throw()


def test_sharded_stencil_rejects_single_column_shards(rng):
    from xcontour_tpu.parallel import make_mesh
    from xcontour_tpu.parallel.stencil import sharded_squared_gradient
    mesh = make_mesh(8, x_size=8)
    grid = _tiny_grid(nx=8, lon_end=90.0)              # regional: periodic_x False
    assert not grid.periodic_x
    tr = jnp.asarray(np.asarray(_tiny_tracer(rng, nx=8)))[None]
    with pytest.raises(ValueError, match="2 columns per shard"):
        sharded_squared_gradient(tr, grid, mesh)


def test_plot_keff_nan_yeq_lane():
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from xcontour_tpu import viz
    yeq = np.linspace(-80.0, 80.0, 21)[None, :] * np.ones((4, 1))
    yeq[2, :3] = np.nan                  # empty contour bins -> NaN Yeq lanes
    nkeff = np.exp(np.linspace(0.0, 2.0, 21))[None, :] * np.ones((4, 1))
    ax = viz.plot_keff(nkeff, yeq)
    assert len(ax.collections) >= 1      # contourf built despite NaN coords
    plt.close("all")


def test_coarsen_indivisible_ratio_raises():
    from xcontour_tpu.utils.coarsen import coarsen
    with pytest.raises(ValueError, match="not divisible"):
        coarsen(np.zeros((10, 12)), 4)


def test_deg2m_matches_reference_formula():
    from xcontour_tpu.utils import constants
    np.testing.assert_allclose(constants.deg2m(),
                               2 * np.pi * 6371200.0 / 360.0, rtol=1e-15)
    np.testing.assert_allclose(constants.deg2m(100.0),
                               2 * np.pi * 100.0 / 360.0, rtol=1e-15)


def test_prof_annotate_and_trace(tmp_path):
    from xcontour_tpu.utils import prof
    with prof.annotate("unit-test-scope"):
        x = jnp.arange(8.0) * 2.0
    assert float(x.sum()) == 56.0
    with prof.trace(str(tmp_path)):
        _ = jnp.arange(4.0) + 1.0
    assert any(tmp_path.iterdir())       # the profiler wrote a trace dir


def test_dataset_getitem_falls_back_to_coords():
    from xcontour_tpu.utils.ncio import Dataset
    ds = Dataset(variables={"v": np.ones(3)},
                 coords={"lat": np.arange(3.0)})
    np.testing.assert_array_equal(ds["lat"], np.arange(3.0))
    assert "lat" in ds and "v" in ds and "nope" not in ds


def test_load_h5_lazy_closes_handle_on_visit_failure(tmp_path, monkeypatch):
    """A mid-file visiting failure in lazy mode must close the h5 handle
    (no leaked file descriptors on corrupt archives) and propagate."""
    import h5py
    from xcontour_tpu.utils import ncio
    path = str(tmp_path / "x.nc")
    with h5py.File(path, "w") as f:
        f.create_dataset("v", data=np.ones(3))

    opened = {}
    real_file = h5py.File

    def spy_file(*a, **k):
        opened["f"] = real_file(*a, **k)
        return opened["f"]

    monkeypatch.setattr(h5py, "File", spy_file)
    monkeypatch.setattr(ncio, "_visit_h5",
                        lambda *a, **k: (_ for _ in ()).throw(
                            RuntimeError("visit boom")))
    with pytest.raises(RuntimeError, match="visit boom"):
        ncio._load_h5(path, lazy=True)
    assert not opened["f"].id.valid      # handle was closed, not leaked
