"""End-to-end tests of the batch CLI (python -m xcontour_tpu ...).

Drives cli.main() in-process on synthetic netCDF files written through
utils.ncio (both HDF5/nc4 and classic nc3 flavors), and asserts the output
files reproduce direct pipeline calls element-for-element.  Models the
reference's production drivers (tests/LWA.py, test_Keff_atmos.py) as a
deployable command instead of a hand-edited script.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from xcontour_tpu import cli, pipeline
from xcontour_tpu.grid import from_latlon
from xcontour_tpu.utils.ncio import load_dataset, save_dataset, \
    save_dataset_nc3


@pytest.fixture
def synth_nc(tmp_path, rng):
    """A small (time=5, lat=24, lon=36) archive in netCDF-4 flavor."""
    T, Ny, Nx = 5, 24, 36
    lat = np.linspace(-60.0, 60.0, Ny)
    lon = np.linspace(0.0, 350.0, Nx)
    q = (np.sin(np.deg2rad(lat))[None, :, None]
         + 0.25 * rng.standard_normal((T, Ny, Nx))).astype(np.float32)
    path = str(tmp_path / "synth.nc")
    save_dataset(path,
                 {"q": q, "latitude": lat, "longitude": lon},
                 {"q": ("time", "latitude", "longitude"),
                  "latitude": ("latitude",), "longitude": ("longitude",)},
                 coords={"latitude": lat, "longitude": lon,
                         "time": np.arange(T, dtype=np.int32)})
    return path, q, lat, lon


def test_cli_keff_matches_pipeline(synth_nc, tmp_path, capsys):
    path, q, lat, lon = synth_nc
    out = str(tmp_path / "keff.nc")
    rc = cli.main(["keff", path, "--var", "q", "-N", "21", "--batch", "3",
                   "--out", out])
    assert rc == 0
    assert "wrote" in capsys.readouterr().out

    ds = load_dataset(out)
    assert ds.dims_of("nkeff") == ("time", "contour")
    assert ds["nkeff"].shape == (5, 21)

    grid = from_latlon(lat, lon, dim_names=("latitude", "longitude"))
    ref = pipeline.keff_pipeline(jnp.asarray(q), grid, N=21,
                                 increase=True, lt=True, lmin="analytic")
    np.testing.assert_array_equal(ds["nkeff"],
                                  np.asarray(ref["origin"]["nkeff"]))
    np.testing.assert_array_equal(ds["Yeq"], np.asarray(ref["origin"]["Yeq"]))
    # level values live under 'levels'; the 'contour' dim is the level index
    np.testing.assert_array_equal(ds["levels"],
                                  np.asarray(ref["origin"]["contour"]))

    # --fields subsetting happens after labeling: the contour dim (and its
    # coordinate) survive even when 'levels' itself is filtered out
    out2 = str(tmp_path / "keff_sub.nc")
    rc = cli.main(["keff", path, "--var", "q", "-N", "21",
                   "--fields", "nkeff", "--out", out2])
    assert rc == 0
    ds2 = load_dataset(out2)
    assert set(ds2.variables) == {"nkeff", "latitude", "longitude",
                                  "contour", "time"}
    assert ds2.dims_of("nkeff") == ("time", "contour")
    np.testing.assert_array_equal(ds2["nkeff"], ds["nkeff"])


def test_cli_autodetect_var_and_default_out(synth_nc, tmp_path):
    path, q, lat, lon = synth_nc
    # only one variable sits on the (latitude, longitude) plane -> no --var;
    # no --out -> <input stem>_<cmd>.nc next to the input
    rc = cli.main(["clength", path, "-N", "11"])
    assert rc == 0
    ds = load_dataset(str(tmp_path / "synth_clength.nc"))
    assert ds["lengths"].shape == (5, 11)
    assert np.isfinite(ds["lengths"]).any()


def test_cli_unbatched_table_not_streamed(synth_nc, tmp_path):
    """keff's A(Yeq) table is batch-independent (built from the grid mask);
    it must be dropped before chunk streaming, not sliced along its bin
    axis and concatenated as if it were batched."""
    path, q, lat, lon = synth_nc
    out = str(tmp_path / "kt.nc")
    # batch > Ny would previously crash the reassembly reshape; batch < T
    # would previously produce a silently corrupted 'table' variable
    rc = cli.main(["keff", path, "--var", "q", "-N", "11", "--batch", "2",
                   "--out", out])
    assert rc == 0
    ds = load_dataset(out)
    assert "table" not in ds.variables
    rc = cli.main(["keff", path, "--var", "q", "-N", "11", "--batch", "32",
                   "--out", out])
    assert rc == 0


def test_cli_partial_dims_override(tmp_path, rng):
    """--dims Y=... fills only that axis; the other is still autodetected,
    and names absent from the file error cleanly."""
    Ny, Nx = 12, 18
    ylat = np.linspace(-40.0, 40.0, Ny)
    lon = np.linspace(0.0, 340.0, Nx)
    q = rng.standard_normal((2, Ny, Nx)).astype(np.float32)
    path = str(tmp_path / "p.nc")
    save_dataset(path, {"q": q, "ylat": ylat, "longitude": lon},
                 {"q": ("time", "ylat", "longitude"),
                  "ylat": ("ylat",), "longitude": ("longitude",)},
                 coords={"ylat": ylat, "longitude": lon})
    out = str(tmp_path / "p_out.nc")
    rc = cli.main(["clength", path, "--var", "q", "-N", "7",
                   "--dims", "Y=ylat", "--out", out])
    assert rc == 0
    ds = load_dataset(out)
    assert ds.dims_of("lengths") == ("time", "contour")

    with pytest.raises(SystemExit, match="not in file"):
        cli.main(["clength", path, "--var", "q", "--dims", "Y=nope"])
    with pytest.raises(SystemExit, match="expected X= or Y="):
        cli.main(["clength", path, "--var", "q", "--dims", "W=ylat"])


def test_cli_lwa_nc3_roundtrip(synth_nc, tmp_path):
    path, q, lat, lon = synth_nc
    out = str(tmp_path / "lwa.nc")
    rc = cli.main(["lwa", path, "--var", "q", "-N", "21", "--format", "nc3",
                   "--out", out, "--fields", "lwa,Q"])
    assert rc == 0
    ds = load_dataset(out)
    assert set(ds.variables) >= {"lwa", "Q"}
    assert "Yeq" not in ds.variables  # --fields filtered
    assert ds.dims_of("lwa") == ("time", "latitude", "longitude")
    assert ds.dims_of("Q") == ("time", "latitude")

    grid = from_latlon(lat, lon, dim_names=("latitude", "longitude"))
    ref = pipeline.lwa_pipeline(jnp.asarray(q), grid, N=21,
                                increase=True, lt=True)
    np.testing.assert_array_equal(ds["lwa"], np.asarray(ref["lwa"]))


def test_cli_keff_lwa_interp_eq(synth_nc, tmp_path):
    path, q, lat, lon = synth_nc
    out = str(tmp_path / "kl.nc")
    rc = cli.main(["keff-lwa", path, "--var", "q", "-N", "21",
                   "--interp-eq", "--out", out])
    assert rc == 0
    ds = load_dataset(out)
    # interp products land on the grid's equivalent coordinate
    assert ds.dims_of("nkeff_at") == ("time", "latitude")
    assert ds["nkeff_at"].shape == (5, len(lat))


def test_cli_isel_and_lead_dims(tmp_path, rng):
    """4-D input (time, lev, lat, lon): lead dims stream flattened and come
    back named; --isel slices a named lead dim away."""
    T, L, Ny, Nx = 3, 2, 16, 24
    lat = np.linspace(-45.0, 45.0, Ny)
    lon = np.linspace(0.0, 345.0, Nx)
    q = rng.standard_normal((T, L, Ny, Nx)).astype(np.float32)
    path = str(tmp_path / "four_d.nc")
    save_dataset(path,
                 {"pv": q, "latitude": lat, "longitude": lon},
                 {"pv": ("time", "lev", "latitude", "longitude"),
                  "latitude": ("latitude",), "longitude": ("longitude",)},
                 coords={"latitude": lat, "longitude": lon,
                         "lev": np.asarray([850.0, 500.0]),
                         "time": np.arange(T, dtype=np.int32)})

    out = str(tmp_path / "k4.nc")
    rc = cli.main(["keff", path, "--var", "pv", "-N", "11", "--batch", "4",
                   "--out", out])
    assert rc == 0
    ds = load_dataset(out)
    assert ds.dims_of("nkeff") == ("time", "lev", "contour")
    assert ds["nkeff"].shape == (T, L, 11)
    np.testing.assert_array_equal(ds["lev"], [850.0, 500.0])

    out2 = str(tmp_path / "k4_sel.nc")
    rc = cli.main(["keff", path, "--var", "pv", "-N", "11",
                   "--isel", "lev=1", "--out", out2])
    assert rc == 0
    ds2 = load_dataset(out2)
    assert ds2["nkeff"].shape == (T, 11)
    np.testing.assert_array_equal(ds2["nkeff"], ds["nkeff"][:, 1])


def test_cli_resume_stem(synth_nc, tmp_path, capsys):
    """--stem writes per-chunk checkpoints; a rerun skips completed chunks
    and reassembles the identical output file."""
    path, q, lat, lon = synth_nc
    stem = str(tmp_path / "ck" / "run")
    (tmp_path / "ck").mkdir()
    out1 = str(tmp_path / "a.nc")
    rc = cli.main(["keff", path, "--var", "q", "-N", "11", "--batch", "2",
                   "--stem", stem, "--out", out1])
    assert rc == 0
    first = capsys.readouterr().out

    out2 = str(tmp_path / "b.nc")
    rc = cli.main(["keff", path, "--var", "q", "-N", "11", "--batch", "2",
                   "--stem", stem, "--out", out2])
    assert rc == 0
    second = capsys.readouterr().out
    assert second.count("skipped") == 3  # ceil(5/2) chunks all resumed

    a, b = load_dataset(out1), load_dataset(out2)
    for k in a.variables:
        np.testing.assert_array_equal(a[k], b[k])
    assert first  # both runs reported

    # changed parameters against the same stem are refused (the sidecar
    # fingerprint pins the checkpoint set), not silently reassembled stale
    with pytest.raises(SystemExit, match="different run"):
        cli.main(["keff", path, "--var", "q", "-N", "21", "--batch", "2",
                  "--stem", stem, "--out", str(tmp_path / "c.nc")])
    with pytest.raises(SystemExit, match="different run"):
        cli.main(["keff", path, "--var", "q", "-N", "11", "--batch", "3",
                  "--stem", stem, "--out", str(tmp_path / "c.nc")])


@pytest.mark.slow
def test_cli_pipeline_option_flags(synth_nc, tmp_path):
    """--no-hist, --metric dy, and --with-lwa2 reach the pipeline kwargs."""
    path, q, lat, lon = synth_nc
    grid = from_latlon(lat, lon, dim_names=("latitude", "longitude"))

    out = str(tmp_path / "bh.nc")
    assert cli.main(["keff", path, "--var", "q", "-N", "11", "--no-hist",
                     "--out", out]) == 0
    ref = pipeline.keff_pipeline(jnp.asarray(q), grid, N=11, increase=True,
                                 lt=True, hist=False, lmin="analytic")
    np.testing.assert_array_equal(load_dataset(out)["nkeff"],
                                  np.asarray(ref["origin"]["nkeff"]))

    out = str(tmp_path / "dy.nc")
    assert cli.main(["lwa", path, "--var", "q", "-N", "11", "--metric", "dy",
                     "--out", out]) == 0
    ref = pipeline.lwa_pipeline(jnp.asarray(q), grid, N=11, increase=True,
                                lt=True, metric="dy")
    np.testing.assert_array_equal(load_dataset(out)["lwa"],
                                  np.asarray(ref["lwa"]))

    out = str(tmp_path / "l2.nc")
    assert cli.main(["keff-lwa", path, "--var", "q", "-N", "11",
                     "--with-lwa2", "--out", out]) == 0
    ds = load_dataset(out)
    assert "lwa2" in ds.variables
    assert ds.dims_of("lwa2") == ("time", "latitude", "longitude")


def test_cli_scale_var_sigma_production(tmp_path, rng):
    """--scale-var composes tracer = sigma*q before the pipeline (the
    reference's sigma-weighted production LWA, tests/LWA.py:59-69), with
    named-dim broadcasting; mismatched dims error cleanly."""
    T, Ny, Nx = 3, 16, 24
    lat = np.linspace(-45.0, 45.0, Ny)
    lon = np.linspace(0.0, 345.0, Nx)
    q = rng.standard_normal((T, Ny, Nx)).astype(np.float32)
    sigma = (120.0 * (1.0 + 0.5 * np.cos(np.deg2rad(lat)) ** 2)
             ).astype(np.float32)
    path = str(tmp_path / "sig.nc")
    save_dataset(path,
                 {"q": q, "sigma": sigma, "latitude": lat, "longitude": lon},
                 {"q": ("time", "latitude", "longitude"),
                  "sigma": ("latitude",),
                  "latitude": ("latitude",), "longitude": ("longitude",)},
                 coords={"latitude": lat, "longitude": lon})

    out = str(tmp_path / "sig_lwa.nc")
    rc = cli.main(["lwa", path, "--var", "q", "--scale-var", "sigma",
                   "-N", "11", "--out", out])
    assert rc == 0
    ds = load_dataset(out)

    grid = from_latlon(lat, lon, dim_names=("latitude", "longitude"))
    composed = jnp.asarray(q * sigma[None, :, None])
    ref = pipeline.lwa_pipeline(composed, grid, N=11, increase=True, lt=True)
    np.testing.assert_array_equal(ds["lwa"], np.asarray(ref["lwa"]))

    with pytest.raises(SystemExit, match="--scale-var 'nope' not in file"):
        cli.main(["lwa", path, "--var", "q", "--scale-var", "nope"])
    # a scale var with a dim the tracer lacks errors cleanly
    save_dataset(str(tmp_path / "bad.nc"),
                 {"q": q, "w": np.ones((2, Ny), np.float32),
                  "latitude": lat, "longitude": lon},
                 {"q": ("time", "latitude", "longitude"),
                  "w": ("member", "latitude"),
                  "latitude": ("latitude",), "longitude": ("longitude",)},
                 coords={"latitude": lat, "longitude": lon,
                         "member": np.arange(2)})
    with pytest.raises(SystemExit, match="are not dims of"):
        cli.main(["lwa", str(tmp_path / "bad.nc"), "--var", "q",
                  "--scale-var", "w"])
    # matching dim NAME but wrong length (e.g. edge-staggered sigma)
    save_dataset(str(tmp_path / "edge.nc"),
                 {"q": q, "sige": np.ones(Ny + 1, np.float32),
                  "latitude": lat, "longitude": lon},
                 {"q": ("time", "latitude", "longitude"),
                  "sige": ("latitude",),
                  "latitude": ("latitude",), "longitude": ("longitude",)},
                 coords={"latitude": lat, "longitude": lon})
    with pytest.raises(SystemExit, match="has length 17, but 'q' has 16"):
        cli.main(["lwa", str(tmp_path / "edge.nc"), "--var", "q",
                  "--scale-var", "sige"])


@pytest.mark.slow
def test_cli_mesh_sharded_matches_unsharded(synth_nc, tmp_path):
    """--mesh runs each chunk GSPMD-sharded over the virtual 8-device mesh
    (batch x spatial); results match the single-device run."""
    path, q, lat, lon = synth_nc
    plain = str(tmp_path / "plain.nc")
    assert cli.main(["keff-lwa", path, "--var", "q", "-N", "21",
                     "--batch", "4", "--f64", "--out", plain]) == 0

    # contour-space outputs are reduction-order exact under every mesh; the
    # plane LWA field has near-cancellation cells (profile terms of ~1e10
    # summing to ~0) where a differently-fused sharded XLA program rounds
    # differently — assert those with an atol scaled to the field magnitude
    for spec, batch in (("8x1", "8"), ("4x2", "4"), ("2x4", "4")):
        out = str(tmp_path / f"mesh{spec}.nc")
        assert cli.main(["keff-lwa", path, "--var", "q", "-N", "21",
                         "--batch", batch, "--f64", "--mesh", spec,
                         "--out", out]) == 0
        a, b = load_dataset(plain), load_dataset(out)
        for k in ("nkeff", "Yeq", "Leq2", "Lmin", "Q", "intArea",
                  "intgrdS", "levels"):
            np.testing.assert_allclose(b[k], a[k], rtol=1e-12, atol=0,
                                       err_msg=f"{spec}:{k}")
        scale = np.nanmax(np.abs(a["lwa"]))
        np.testing.assert_allclose(b["lwa"], a["lwa"], rtol=1e-9,
                                   atol=1e-9 * scale,
                                   err_msg=f"{spec}:lwa")

    with pytest.raises(SystemExit, match="devices requested"):
        cli.main(["keff", path, "--var", "q", "--mesh", "64"])
    with pytest.raises(SystemExit, match="not divisible by the 4-way"):
        cli.main(["keff", path, "--var", "q", "--mesh", "8", "--batch", "3"])
    with pytest.raises(SystemExit, match="expected a device count"):
        cli.main(["keff", path, "--var", "q", "--mesh", "axb"])


def test_cli_ocean_mask(tmp_path, rng):
    """--mask-from-nan / --mask-var build the grid fluid mask (the ocean
    driver's maskC): results equal a direct pipeline call on a masked grid,
    and differ from the unmasked run."""
    Ny, Nx = 16, 24
    lat = np.linspace(-45.0, 45.0, Ny)
    lon = np.linspace(0.0, 345.0, Nx)
    q = (np.sin(np.deg2rad(lat))[None, :, None]
         + 0.2 * rng.standard_normal((3, Ny, Nx))).astype(np.float32)
    land = np.zeros((Ny, Nx), bool)
    land[5:9, 3:8] = True
    q[:, land] = np.nan
    maskC = (~land).astype(np.float32)
    path = str(tmp_path / "ocean.nc")
    save_dataset(path,
                 {"q": q, "maskC": maskC, "latitude": lat, "longitude": lon},
                 {"q": ("time", "latitude", "longitude"),
                  "maskC": ("latitude", "longitude"),
                  "latitude": ("latitude",), "longitude": ("longitude",)},
                 coords={"latitude": lat, "longitude": lon})

    out_nan = str(tmp_path / "m1.nc")
    assert cli.main(["keff", path, "--var", "q", "-N", "11",
                     "--mask-from-nan", "--out", out_nan]) == 0
    out_var = str(tmp_path / "m2.nc")
    assert cli.main(["keff", path, "--var", "q", "-N", "11",
                     "--mask-var", "maskC", "--out", out_var]) == 0
    out_plain = str(tmp_path / "m0.nc")
    assert cli.main(["keff", path, "--var", "q", "-N", "11",
                     "--out", out_plain]) == 0

    a, b, p = (load_dataset(x) for x in (out_nan, out_var, out_plain))
    np.testing.assert_array_equal(a["Yeq"], b["Yeq"])  # same mask two ways

    grid = from_latlon(lat, lon, mask=maskC,
                       dim_names=("latitude", "longitude"))
    ref = pipeline.keff_pipeline(jnp.asarray(q), grid, N=11,
                                 increase=True, lt=True, lmin="analytic")
    np.testing.assert_array_equal(a["Yeq"], np.asarray(ref["origin"]["Yeq"]))
    # the mask changes the A(Yeq) table, hence Yeq
    assert not np.array_equal(a["Yeq"], p["Yeq"])

    with pytest.raises(SystemExit, match="exclusive"):
        cli.main(["keff", path, "--var", "q", "--mask-var", "maskC",
                  "--mask-from-nan"])
    with pytest.raises(SystemExit, match="--mask-var 'q' dims"):
        cli.main(["keff", path, "--var", "q", "--mask-var", "q"])


def test_cli_mask_reaches_geometry_kernels(tmp_path, rng):
    """--mask-var NaNs the tracer (the reference ocean drivers'
    tracer.where(maskC)), so the length/local-window kernels exclude land —
    not just the A(Yeq) table."""
    Ny, Nx = 16, 24
    lat = np.linspace(-45.0, 45.0, Ny)
    lon = np.linspace(0.0, 345.0, Nx)
    # REAL values over land: without tracer masking the kernels would
    # happily trace contours through it
    q = (np.sin(np.deg2rad(lat))[None, :, None]
         + 0.2 * rng.standard_normal((2, Ny, Nx))).astype(np.float32)
    maskC = np.ones((Ny, Nx), np.float32)
    maskC[4:10, 2:9] = 0.0
    path = str(tmp_path / "land.nc")
    save_dataset(path,
                 {"q": q, "maskC": maskC, "latitude": lat, "longitude": lon},
                 {"q": ("time", "latitude", "longitude"),
                  "maskC": ("latitude", "longitude"),
                  "latitude": ("latitude",), "longitude": ("longitude",)},
                 coords={"latitude": lat, "longitude": lon})

    out_m = str(tmp_path / "cm.nc")
    assert cli.main(["clength", path, "--var", "q", "-N", "9",
                     "--mask-var", "maskC", "--out", out_m]) == 0
    out_p = str(tmp_path / "cp.nc")
    assert cli.main(["clength", path, "--var", "q", "-N", "9",
                     "--out", out_p]) == 0
    Lm = load_dataset(out_m)["lengths"]
    Lp = load_dataset(out_p)["lengths"]
    fin = np.isfinite(Lm) & np.isfinite(Lp)
    assert fin.any()
    assert not np.allclose(Lm[fin], Lp[fin])  # land contours excluded
    assert (Lm[fin] <= Lp[fin] + 1e-3).all()  # masking can only remove length

    # parity with a direct pipeline call on the NaN-masked tracer
    grid = from_latlon(lat, lon, mask=maskC,
                       dim_names=("latitude", "longitude"))
    qn = np.where(maskC[None] != 0, q, np.nan)
    ref = pipeline.clength_pipeline(jnp.asarray(qn), grid, N=9,
                                    increase=True, lt=True)
    np.testing.assert_array_equal(Lm, np.asarray(ref["lengths"]))


def test_cli_local_length(synth_nc, tmp_path):
    """local-length streams the windowed kernel and labels the window-center
    dims; values match a direct vmapped call."""
    import jax
    from xcontour_tpu.diagnostics.local_length import local_contour_lengths

    path, q, lat, lon = synth_nc
    out = str(tmp_path / "ll.nc")
    rc = cli.main(["local-length", path, "--var", "q", "--window", "9",
                   "--stride", "5", "--out", out])
    assert rc == 0
    ds = load_dataset(out)
    assert ds.dims_of("llen") == ("time", "y_window", "x_window")

    latf = jnp.asarray(lat, jnp.float32)
    lonf = jnp.asarray(lon, jnp.float32)

    def one(s):
        return local_contour_lengths(s, latf, lonf,
                                     window=9, stride=5, latlon=True)[0]

    want = np.asarray(jax.vmap(one)(jnp.asarray(q, jnp.float32)))
    np.testing.assert_allclose(ds["llen"], want, rtol=1e-6)
    _, wy, wx = local_contour_lengths(jnp.zeros((24, 36), jnp.float32),
                                      latf, lonf,
                                      window=9, stride=5, latlon=True)
    np.testing.assert_allclose(ds["y_window"], np.asarray(wy), rtol=1e-6)
    np.testing.assert_allclose(ds["x_window"], np.asarray(wx), rtol=1e-6)

    with pytest.raises(SystemExit, match="--window"):
        cli.main(["local-length", path, "--var", "q", "--window", "99"])
    with pytest.raises(SystemExit, match="--stride"):
        cli.main(["local-length", path, "--var", "q", "--window", "9",
                  "--stride", "0"])


def test_cli_validate_finite(tmp_path, rng, capsys):
    """--validate finite rejects chunks whose outputs are entirely
    non-finite; with --on-error skip the archive completes NaN-filled."""
    Ny, Nx = 12, 18
    lat = np.linspace(-40.0, 40.0, Ny)
    lon = np.linspace(0.0, 340.0, Nx)
    q = rng.standard_normal((4, Ny, Nx)).astype(np.float32)
    q[2] = np.nan  # one poisoned snapshot -> its chunk fails validation
    path = str(tmp_path / "v.nc")
    save_dataset(path, {"q": q, "latitude": lat, "longitude": lon},
                 {"q": ("time", "latitude", "longitude"),
                  "latitude": ("latitude",), "longitude": ("longitude",)},
                 coords={"latitude": lat, "longitude": lon})

    out = str(tmp_path / "v_out.nc")
    rc = cli.main(["clength", path, "--var", "q", "-N", "7", "--batch", "1",
                   "--validate", "finite", "--on-error", "skip",
                   "--out", out])
    assert rc == 0
    assert "FAILED" in capsys.readouterr().out
    ds = load_dataset(out)
    L = ds["lengths"]
    assert not np.isfinite(L[2]).any()      # NaN-filled failed chunk
    assert np.isfinite(L[[0, 1, 3]]).any()  # healthy chunks intact

    with pytest.raises(ValueError, match="entirely non-finite"):
        cli.main(["clength", path, "--var", "q", "-N", "7", "--batch", "1",
                  "--validate", "finite", "--out",
                  str(tmp_path / "x.nc")])


def test_runner_load_chunks_all_failed(tmp_path):
    """load_chunks raises a clean RuntimeError (not StopIteration) when
    every chunk failed."""
    from xcontour_tpu import runner

    stem = str(tmp_path / "af")
    with open(stem + "_ck00000.failed", "w") as f:
        f.write('{"chunk": 0, "nvalid": 2, "error": "boom"}')
    with pytest.raises(RuntimeError, match="nothing to assemble"):
        runner.load_chunks(stem, allow_failed=True)


@pytest.mark.slow
def test_cli_fractal_and_gt_decrease_flags(tmp_path, rng):
    Ny, Nx = 16, 32
    lat = np.linspace(-45.0, 45.0, Ny)
    lon = np.linspace(0.0, 348.75, Nx)
    q = rng.standard_normal((2, Ny, Nx)).astype(np.float32)
    path = str(tmp_path / "f.nc")
    save_dataset_nc3(path, {"q": q},
                     {"q": ("time", "latitude", "longitude"),
                      "latitude": ("latitude",),
                      "longitude": ("longitude",)},
                     coords={"latitude": lat, "longitude": lon})

    out = str(tmp_path / "frac.nc")
    rc = cli.main(["fractal", path, "--var", "q", "-N", "11",
                   "--strides", "1,2,4", "--decrease", "--gt",
                   "--out", out])
    assert rc == 0
    ds = load_dataset(out)
    assert ds["D"].shape == (2, 11)

    grid = from_latlon(lat, lon, dim_names=("latitude", "longitude"))
    ref = pipeline.fractal_pipeline(jnp.asarray(q), grid, N=11,
                                    strides=(1, 2, 4), increase=False,
                                    lt=False, box_counting=True)
    np.testing.assert_array_equal(ds["D"], np.asarray(ref["D"]))


def test_cli_info_and_errors(synth_nc, tmp_path, capsys):
    path, q, lat, lon = synth_nc
    assert cli.main(["info", path]) == 0
    assert "q  dims=" in capsys.readouterr().out

    with pytest.raises(SystemExit, match="not in file"):
        cli.main(["keff", path, "--var", "nope"])
    with pytest.raises(SystemExit, match="--isel dim"):
        cli.main(["keff", path, "--var", "q", "--isel", "lev=0"])
    with pytest.raises(SystemExit, match="must be an integer"):
        cli.main(["keff", path, "--var", "q", "--isel", "time=surface"])
    with pytest.raises(SystemExit, match="out of range"):
        cli.main(["keff", path, "--var", "q", "--isel", "time=9"])
    with pytest.raises(SystemExit, match="--batch must be"):
        cli.main(["keff", path, "--var", "q", "--batch", "0"])
    with pytest.raises(SystemExit, match="do not divide"):
        cli.main(["fractal", path, "--var", "q", "--strides", "7"])
    with pytest.raises(SystemExit, match="not among outputs"):
        cli.main(["clength", path, "--var", "q", "--fields", "bogus",
                  "--out", str(tmp_path / "x.nc")])


def test_cli_lwa_part_cyclone_maps_to_upper(synth_nc, tmp_path):
    """--part cyclone/anticyclone are the CLI names for the reference's
    'upper' (W+) / 'lower' (W-) selections (reference core.py:709-712) and
    must reach the kernels as such — and canonicalize identically in the
    resume fingerprint."""
    path, q, lat, lon = synth_nc
    out = str(tmp_path / "lwa_cyc.nc")
    rc = cli.main(["lwa", path, "--var", "q", "-N", "9", "--batch", "5",
                   "--part", "cyclone", "--out", out])
    assert rc == 0
    ds = load_dataset(out)

    grid = from_latlon(lat, lon, dim_names=("latitude", "longitude"))
    ref = pipeline.lwa_pipeline(jnp.asarray(q), grid, N=9, increase=True,
                                lt=True, part="upper")
    np.testing.assert_array_equal(ds["lwa"], np.asarray(ref["lwa"]))

    # the reference spelling is accepted and resumes onto the same stem
    stem = str(tmp_path / "ck")
    rc = cli.main(["lwa", path, "--var", "q", "-N", "9", "--batch", "5",
                   "--part", "cyclone", "--stem", stem,
                   "--out", str(tmp_path / "a.nc")])
    assert rc == 0
    rc = cli.main(["lwa", path, "--var", "q", "-N", "9", "--batch", "5",
                   "--part", "upper", "--stem", stem,
                   "--out", str(tmp_path / "b.nc")])
    assert rc == 0  # same fingerprint: no "different run" refusal
    a = load_dataset(str(tmp_path / "a.nc"))
    b = load_dataset(str(tmp_path / "b.nc"))
    np.testing.assert_array_equal(a["lwa"], b["lwa"])


def test_cli_lwa_lin_rejects_part_split(synth_nc):
    """--lwa-method lin computes only the combined W+ + W- sum (the
    linearized kernel telescopes the two parts); asking it for a split
    part must be a clean CLI rejection, not a trace-time ValueError
    (found by tools/fuzz_cli.py)."""
    path, *_ = synth_nc
    for part in ("upper", "lower", "cyclone", "anticyclone"):
        with pytest.raises(SystemExit, match="lwa-method lin"):
            cli.main(["lwa", path, "--var", "q", "--part", part,
                      "--lwa-method", "lin"])
    # part=all with lin stays valid (validated elsewhere end-to-end)


def test_cli_stem_resume_with_isel_and_trailing_chunk_guard(synth_nc,
                                                            tmp_path):
    """(1) A byte-identical rerun with --isel resumes instead of being
    refused (the fingerprint's kv lists must survive the JSON sidecar
    round-trip); (2) a lost TRAILING chunk file is detected, not silently
    truncated."""
    import os
    path, q, lat, lon = synth_nc
    stem = str(tmp_path / "ck")
    argv = ["keff", path, "--var", "q", "-N", "9", "--batch", "2",
            "--isel", "time=0", "--dims", "X=longitude,Y=latitude",
            "--stem", stem, "--out", str(tmp_path / "a.nc")]
    assert cli.main(argv) == 0
    # identical rerun: must resume (round 2 of the same fingerprint), not
    # exit with "holds checkpoints from a different run"
    assert cli.main(argv[:-1] + [str(tmp_path / "b.nc")]) == 0
    a = load_dataset(str(tmp_path / "a.nc"))
    b = load_dataset(str(tmp_path / "b.nc"))
    np.testing.assert_array_equal(a["nkeff"], b["nkeff"])

    # trailing-chunk loss: isel'd single snapshot -> 1 chunk; simulate a
    # bigger run for the guard via the runner API directly
    from xcontour_tpu import runner
    import jax
    import jax.numpy as jnp_
    snaps = np.random.default_rng(3).normal(size=(6, 8, 12))
    stem2 = str(tmp_path / "tail")
    runner.run_batched(jax.jit(lambda x: {"m": jnp_.mean(x, (-2, -1))}),
                       snaps, batch=2, out_stem=stem2, log=lambda s: None)
    os.remove(stem2 + "_ck00002.npz")         # the LAST chunk
    with pytest.raises(RuntimeError, match="gap"):
        runner.load_chunks(stem2, expect_chunks=3)
    # without expect_chunks the truncation is undetectable by design
    out = runner.load_chunks(stem2)
    assert out["m"].shape[0] == 4


def test_cli_dims_z_rejected(synth_nc, tmp_path):
    path, q, lat, lon = synth_nc
    with pytest.raises(SystemExit, match="use --isel"):
        cli.main(["keff", path, "--var", "q", "--dims", "Z=time",
                  "--out", str(tmp_path / "z.nc")])


def test_lazy_load_and_lazy_field_equivalence(synth_nc, tmp_path, rng):
    """load_dataset(lazy=True) defers reads (h5py dataset, not ndarray), and
    the CLI's _LazyField applies isel/scale/mask/cast per chunk to exactly
    the eager composition."""
    import argparse
    path, q, lat, lon = synth_nc
    ds = load_dataset(path, lazy=True)
    assert not isinstance(ds["q"], np.ndarray)      # still on disk
    np.testing.assert_array_equal(np.asarray(ds["q"][1:3]), q[1:3])

    # sigma(lat) scale + isel + mask-from-nan through _load_field
    sigma = np.linspace(0.5, 1.5, lat.size).astype(np.float32)
    qn = q.copy()
    qn[:, 2, 3] = np.nan                           # topography cell
    p2 = str(tmp_path / "lazy2.nc")
    save_dataset(p2, {"q": qn, "sigma": sigma, "latitude": lat,
                      "longitude": lon},
                 {"q": ("time", "latitude", "longitude"),
                  "sigma": ("latitude",),
                  "latitude": ("latitude",), "longitude": ("longitude",)},
                 coords={"latitude": lat, "longitude": lon,
                         "time": np.arange(5, dtype=np.int32)})
    args = argparse.Namespace(
        input=p2, var="q", dims=None, isel=["time=1"], scale_var="sigma",
        mask_var=None, mask_from_nan=True, batch=2, f64=False)
    tracer, grid, lead_names, lead_shape, _ = cli._load_field(args)
    assert type(tracer).__name__ == "_LazyField"
    assert tracer.shape == (1, lat.size, lon.size)

    want = (qn[1] * sigma[:, None]).astype(np.float32)
    want = np.where(np.isfinite(qn).all(axis=0), want, np.nan)
    np.testing.assert_array_equal(tracer[0:1][0], want)
    np.testing.assert_array_equal(np.asarray(grid.mask),
                                  np.isfinite(qn).all(axis=0).astype(
                                      np.float32))


def test_lazy_nc3_memmap(tmp_path, rng):
    """Classic netCDF-3 loads lazily as a memmap and streams through the
    CLI without the mmap-close warning."""
    import warnings
    Ny, Nx = 12, 18
    lat = np.linspace(-50.0, 50.0, Ny)
    lon = np.linspace(0.0, 340.0, Nx)
    q = rng.standard_normal((3, Ny, Nx)).astype(np.float32)
    path = str(tmp_path / "c.nc")
    save_dataset_nc3(path, {"q": q, "lat": lat, "lon": lon},
                     {"q": ("time", "lat", "lon"), "lat": ("lat",),
                      "lon": ("lon",)},
                     coords={"lat": lat, "lon": lon})
    ds = load_dataset(path, lazy=True)
    np.testing.assert_allclose(np.asarray(ds["q"][2:3]), q[2:3], rtol=1e-7)

    out = str(tmp_path / "c_out.nc")
    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)   # mmap-close noise
        rc = cli.main(["clength", path, "--var", "q", "-N", "7",
                       "--batch", "2", "--out", out])
    assert rc == 0
    got = load_dataset(out)
    assert got["lengths"].shape == (3, 7)


def test_cli_descending_latitude_normalized(synth_nc, tmp_path, rng, capsys):
    """ERA5-convention files (latitude 90..-90) are normalized to ascending
    rows — the contour chain assumes an ascending equivalent coordinate
    (reference users sortby first) — and produce the ascending file's
    results exactly, labeled with the ascending coordinate."""
    path, q, lat, lon = synth_nc
    pd = str(tmp_path / "desc.nc")
    save_dataset(pd, {"q": q[:, ::-1].copy(), "latitude": lat[::-1].copy(),
                      "longitude": lon},
                 {"q": ("time", "latitude", "longitude"),
                  "latitude": ("latitude",), "longitude": ("longitude",)},
                 coords={"latitude": lat[::-1].copy(), "longitude": lon,
                         "time": np.arange(5, dtype=np.int32)})
    out_a = str(tmp_path / "asc_lwa.nc")
    out_d = str(tmp_path / "desc_lwa.nc")
    assert cli.main(["lwa", path, "--var", "q", "-N", "9", "--batch", "5",
                     "--out", out_a]) == 0
    assert cli.main(["lwa", pd, "--var", "q", "-N", "9", "--batch", "5",
                     "--out", out_d]) == 0
    assert "normalized to ascending" in capsys.readouterr().out
    a = load_dataset(out_a)
    d = load_dataset(out_d)
    np.testing.assert_array_equal(np.asarray(d["latitude"]),
                                  np.asarray(a["latitude"]))
    np.testing.assert_array_equal(np.asarray(d["lwa"]), np.asarray(a["lwa"]))
