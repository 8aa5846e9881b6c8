"""Failure-injection campaign for the deployment layer (runner + ncio + CLI).

Systematically breaks the batch machinery the way production breaks it —
transient compute faults, flaky reads on lazy sources, damaged checkpoint
files, killed processes, garbage inputs — and asserts every failure either
heals (retry/backoff/resume) or surfaces as a structured error that names
the broken artifact and its repair.  The reference's production driver
(/root/reference/tests/LWA.py) is a bare Python loop where any of these
kills the whole archive run; here survival is tested behavior
(SURVEY.md §5 failure-detection / checkpoint-resume rows).
"""

import json
import os
import signal
import subprocess
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from xcontour_tpu.runner import run_batched, load_chunks
from xcontour_tpu.utils.ncio import load_dataset, save_dataset


def _step(x):
    return {"mean": jnp.mean(x, axis=(-2, -1)), "double": x * 2}


# ---------------------------------------------------------------------------
# transient compute faults: fail k times, then succeed
# ---------------------------------------------------------------------------
def test_chunk_fails_k_times_then_succeeds(rng, monkeypatch):
    """A chunk that fails twice and succeeds on the third attempt heals with
    NO residue (no NaN fill, no marker) and the backoff schedule is the
    documented retry_wait * 2**attempt geometric."""
    snaps = rng.normal(size=(12, 8, 16))
    fails_left = {1: 2}                       # chunk 1 fails twice
    waits = []
    monkeypatch.setattr(time, "sleep", lambda s: waits.append(s))

    def flaky_step(x):
        # identify the chunk by its first snapshot value
        k = int(np.round(float(x[0, 0, 0])))
        if fails_left.get(k, 0) > 0:
            fails_left[k] -= 1
            raise RuntimeError(f"transient fault on chunk {k}")
        return _step(x)

    marked = snaps.copy()
    for k in range(3):
        marked[k * 4, 0, 0] = k               # chunk id beacon
    out = run_batched(flaky_step, marked, batch=4, log=lambda s: None,
                      retries=2, on_error="raise", retry_wait=0.125)
    assert fails_left == {1: 0}
    assert waits == [0.125, 0.25]             # geometric backoff, both waits
    assert np.isfinite(out["mean"]).all()     # healed: no NaN fill anywhere
    np.testing.assert_allclose(out["mean"], marked.mean(axis=(1, 2)),
                               rtol=1e-6)


def test_retries_exhausted_then_raise(rng, monkeypatch):
    """on_error='raise' re-raises the LAST error once retries are spent."""
    snaps = rng.normal(size=(4, 8, 16))
    monkeypatch.setattr(time, "sleep", lambda s: None)
    n = {"v": 0}

    def always_bad(x):
        n["v"] += 1
        raise RuntimeError(f"attempt {n['v']}")

    with pytest.raises(RuntimeError, match="attempt 3"):
        run_batched(always_bad, snaps, batch=4, log=lambda s: None,
                    retries=2, retry_wait=0.0)
    assert n["v"] == 3


# ---------------------------------------------------------------------------
# flaky lazy sources: prefetch-thread read failures
# ---------------------------------------------------------------------------
class _FlakySource:
    """A lazy (T, Ny, Nx) source whose reads of one chunk's row range fail a
    configurable number of times — models a transient HDF5/NFS read error on
    the prefetch thread."""

    def __init__(self, data, bad_rows, fails):
        self._data = np.asarray(data)
        self._bad = bad_rows
        self.fails_left = fails
        self.read_attempts = 0

    @property
    def shape(self):
        return self._data.shape

    @property
    def ndim(self):
        return self._data.ndim

    @property
    def dtype(self):
        return self._data.dtype

    def __getitem__(self, sl):
        rows = range(*sl.indices(self._data.shape[0]))
        if self._bad in rows:
            self.read_attempts += 1
            if self.fails_left > 0:
                self.fails_left -= 1
                raise OSError("simulated transient read error "
                              f"(rows {rows.start}:{rows.stop})")
        return self._data[sl]


def test_prefetch_read_transient_failure_heals(rng):
    """One transient read error on the prefetch thread is re-read through the
    retry machinery (ADVICE r3 item 1) — even with retries=0 the re-read
    itself gets one shot — and the archive completes exactly."""
    data = rng.normal(size=(12, 8, 16))
    src = _FlakySource(data, bad_rows=4, fails=1)   # chunk 1, fails once
    out = run_batched(jax.jit(_step), src, batch=4, log=lambda s: None,
                      retries=0, retry_wait=0.0)
    assert src.read_attempts == 2                   # prefetch fail + re-read
    np.testing.assert_allclose(out["mean"], data.mean(axis=(1, 2)),
                               rtol=1e-6)


def test_prefetch_read_permanent_failure_isolated(tmp_path, rng):
    """A permanently unreadable chunk becomes a structured .failed record
    (file mode) / NaN fill (memory mode); the rest of the archive survives."""
    data = rng.normal(size=(12, 8, 16))

    # file mode: marker carries the read error text
    src = _FlakySource(data, bad_rows=4, fails=10 ** 9)
    stem = str(tmp_path / "flaky")
    run_batched(jax.jit(_step), src, batch=4, out_stem=stem,
                log=lambda s: None, retries=1, on_error="skip",
                retry_wait=0.0)
    with open(stem + "_ck00001.failed") as f:
        rec = json.load(f)
    assert rec["chunk"] == 1 and "read error" in rec["error"]
    out = load_chunks(stem, allow_failed=True, expect_chunks=3)
    assert np.isnan(out["mean"][4:8]).all()
    good = np.r_[0:4, 8:12]
    np.testing.assert_allclose(out["mean"][good],
                               data[good].mean(axis=(1, 2)), rtol=1e-6)

    # memory mode: NaN fill keeps the time axis aligned
    src2 = _FlakySource(data, bad_rows=8, fails=10 ** 9)
    out2 = run_batched(jax.jit(_step), src2, batch=4, log=lambda s: None,
                       retries=0, on_error="skip", retry_wait=0.0)
    assert np.isnan(out2["mean"][8:]).all()
    np.testing.assert_allclose(out2["mean"][:8], data[:8].mean(axis=(1, 2)),
                               rtol=1e-6)

    # resume with the source healed: only the failed chunk recomputes and
    # the marker clears
    src3 = _FlakySource(data, bad_rows=4, fails=0)
    run_batched(jax.jit(_step), src3, batch=4, out_stem=stem,
                log=lambda s: None, on_error="skip", retry_wait=0.0)
    assert not os.path.exists(stem + "_ck00001.failed")
    out3 = load_chunks(stem, expect_chunks=3)
    np.testing.assert_allclose(out3["mean"], data.mean(axis=(1, 2)),
                               rtol=1e-6)


# ---------------------------------------------------------------------------
# damaged checkpoint artifacts
# ---------------------------------------------------------------------------
@pytest.fixture
def written_stem(tmp_path, rng):
    snaps = rng.normal(size=(12, 8, 16))
    stem = str(tmp_path / "arch")
    run_batched(jax.jit(_step), snaps, batch=4, out_stem=stem,
                log=lambda s: None)
    return stem, snaps


def test_corrupt_chunk_named_in_error(written_stem, rng):
    """A chunk overwritten with garbage raises a RuntimeError that names the
    file and the repair — not numpy's bare pickle/zipfile error — and the
    documented repair (delete + resume) actually works."""
    stem, snaps = written_stem
    bad = stem + "_ck00001.npz"
    with open(bad, "wb") as f:
        f.write(bytes(rng.integers(0, 256, 200, dtype=np.uint8)))
    with pytest.raises(RuntimeError, match="ck00001.npz.*corrupt"):
        load_chunks(stem)
    os.remove(bad)
    run_batched(jax.jit(_step), snaps, batch=4, out_stem=stem,
                log=lambda s: None)           # resume regenerates the hole
    out = load_chunks(stem, expect_chunks=3)
    np.testing.assert_allclose(out["mean"], snaps.mean(axis=(1, 2)),
                               rtol=1e-6)


def test_truncated_chunk_named_in_error(written_stem):
    stem, _ = written_stem
    bad = stem + "_ck00002.npz"
    blob = open(bad, "rb").read()
    with open(bad, "wb") as f:
        f.write(blob[: len(blob) // 2])
    with pytest.raises(RuntimeError, match="ck00002.npz.*corrupt"):
        load_chunks(stem)


def test_corrupt_failed_marker_named_in_error(written_stem):
    stem, _ = written_stem
    marker = stem + "_ck00001.failed"
    with open(marker, "w") as f:
        f.write("{not json")
    # both the refusal path and the allow_failed path must name the marker
    with pytest.raises(RuntimeError, match="ck00001.failed.*unreadable"):
        load_chunks(stem)
    with pytest.raises(RuntimeError, match="ck00001.failed.*unreadable"):
        load_chunks(stem, allow_failed=True)


def test_missing_trailing_chunk_detected(written_stem):
    """Without expect_chunks a lost LAST chunk silently truncates (documented
    limitation); with it the gap guard fires."""
    stem, snaps = written_stem
    os.remove(stem + "_ck00002.npz")
    out = load_chunks(stem)                    # undetectable by design
    assert out["mean"].shape == (8,)
    with pytest.raises(RuntimeError, match="gap.*\\[2\\]"):
        load_chunks(stem, expect_chunks=3)


def test_stale_tmp_from_killed_write_is_ignored(written_stem):
    """A process killed mid-np.savez leaves only a *.tmp.npz (os.replace is
    atomic) — resume must ignore it, regenerate nothing, and reassemble
    cleanly."""
    stem, snaps = written_stem
    with open(stem + "_ck00001.npz.tmp.npz", "wb") as f:
        f.write(b"partial write at kill time")
    calls = []
    run_batched(lambda x: (calls.append(1), _step(x))[1], snaps, batch=4,
                out_stem=stem, log=lambda s: None)
    assert calls == []                         # all chunks already complete
    out = load_chunks(stem, expect_chunks=3)
    np.testing.assert_allclose(out["mean"], snaps.mean(axis=(1, 2)),
                               rtol=1e-6)


# ---------------------------------------------------------------------------
# damaged inputs: garbage / truncated netCDF
# ---------------------------------------------------------------------------
def test_garbage_netcdf_clear_error(tmp_path, rng):
    path = str(tmp_path / "garbage.nc")
    with open(path, "wb") as f:
        f.write(bytes(rng.integers(0, 256, 512, dtype=np.uint8)))
    with pytest.raises(ValueError, match="not a readable netCDF"):
        load_dataset(path)
    with pytest.raises(ValueError, match="not a readable netCDF"):
        load_dataset(path, lazy=True)


def test_truncated_nc4_clear_error(tmp_path):
    path = str(tmp_path / "trunc.nc")
    save_dataset(path, {"q": np.zeros((4, 8, 16), np.float32)},
                 {"q": ("time", "lat", "lon")},
                 coords={"lat": np.linspace(-80, 80, 8),
                         "lon": np.linspace(0.0, 337.5, 16)})
    blob = open(path, "rb").read()
    with open(path, "wb") as f:
        f.write(blob[: len(blob) // 2])
    with pytest.raises(ValueError, match="not a readable netCDF"):
        load_dataset(path)


def test_cli_rejects_garbage_input(tmp_path, rng):
    from xcontour_tpu import cli
    path = str(tmp_path / "garbage.nc")
    with open(path, "wb") as f:
        f.write(bytes(rng.integers(0, 256, 512, dtype=np.uint8)))
    with pytest.raises(SystemExit, match="cannot open"):
        cli.main(["info", path])
    with pytest.raises(SystemExit, match="cannot open"):
        cli.main(["keff", path, "-N", "11",
                  "--out", str(tmp_path / "o.nc")])
    with pytest.raises(SystemExit, match="cannot open"):
        cli.main(["keff", str(tmp_path / "does_not_exist.nc"), "-N", "11",
                  "--out", str(tmp_path / "o.nc")])


# ---------------------------------------------------------------------------
# remaining validation surfaces
# ---------------------------------------------------------------------------
def test_runner_rejects_bad_on_error(rng):
    with pytest.raises(ValueError, match="on_error"):
        run_batched(jax.jit(_step), rng.normal(size=(4, 8, 16)), batch=4,
                    on_error="ignore")


def test_all_chunks_failed_in_memory(rng):
    def bad(x):
        raise RuntimeError("dead")

    with pytest.raises(RuntimeError, match="all chunks failed"):
        run_batched(bad, rng.normal(size=(8, 8, 16)), batch=4,
                    log=lambda s: None, on_error="skip", retry_wait=0.0)


def test_load_chunks_no_files(tmp_path):
    with pytest.raises(FileNotFoundError, match="no chunks"):
        load_chunks(str(tmp_path / "nothing"))


def test_nc3_dtype_narrowing_and_attrs(tmp_path):
    """Classic netCDF-3 has no int64/f16: the writer narrows them (the
    reference's to_netcdf path relies on the same coercion); attrs round-trip
    on both coords and variables."""
    from xcontour_tpu.utils.ncio import save_dataset_nc3
    path = str(tmp_path / "narrow.nc")
    save_dataset_nc3(
        path,
        {"counts": np.arange(6, dtype=np.int64).reshape(2, 3),
         "half": np.ones((2, 3), np.float16)},
        {"counts": ("t", "x"), "half": ("t", "x")},
        coords={"t": np.arange(2, dtype=np.int64)},
        attrs={"counts": {"units": b"1"}, "t": {"axis": b"T"}})
    ds = load_dataset(path)
    # scipy's classic reader returns big-endian views; compare kind/width
    assert ds["counts"].dtype.newbyteorder("=") == np.int32
    assert ds["half"].dtype.newbyteorder("=") == np.float32
    np.testing.assert_array_equal(ds["counts"], np.arange(6).reshape(2, 3))
    assert ds.attrs["counts"]["units"] == b"1"
    assert ds.attrs["t"]["axis"] == b"T"
    # lazy mmap read of the same classic file
    lz = load_dataset(path, lazy=True)
    np.testing.assert_array_equal(np.asarray(lz["half"][0:1]),
                                  np.ones((1, 3), np.float32))


def test_nc4_coord_attrs_roundtrip(tmp_path):
    path = str(tmp_path / "attrs.nc")
    save_dataset(path, {"q": np.zeros((2, 3), np.float32)},
                 {"q": ("lat", "lon")},
                 coords={"lat": np.array([0.0, 1.0]),
                         "lon": np.array([0.0, 1.0, 2.0])},
                 attrs={"lat": {"units": "degrees_north"},
                        "q": {"long_name": "tracer"}})
    ds = load_dataset(path)
    assert ds.attrs["lat"]["units"] == "degrees_north"
    assert ds.attrs["q"]["long_name"] == "tracer"


# ---------------------------------------------------------------------------
# kill -9 a CLI run mid-archive, then resume (VERDICT r3 item 3)
# ---------------------------------------------------------------------------
@pytest.mark.slow
def test_cli_kill9_and_resume(tmp_path, rng):
    """SIGKILL a real `python -m`-style CLI process mid-archive; a rerun with
    the same --stem resumes from the surviving chunks and the final output
    equals a single uninterrupted in-process run."""
    from xcontour_tpu import cli
    from xcontour_tpu.utils.ncio import load_dataset as _ld

    T, Ny, Nx = 30, 24, 36
    lat = np.linspace(-60.0, 60.0, Ny)
    lon = np.linspace(0.0, 350.0, Nx)
    q = (np.sin(np.deg2rad(lat))[None, :, None]
         + 0.25 * rng.standard_normal((T, Ny, Nx))).astype(np.float32)
    path = str(tmp_path / "kill.nc")
    save_dataset(path, {"q": q, "latitude": lat, "longitude": lon},
                 {"q": ("time", "latitude", "longitude"),
                  "latitude": ("latitude",), "longitude": ("longitude",)},
                 coords={"latitude": lat, "longitude": lon,
                         "time": np.arange(T, dtype=np.int32)})
    stem = str(tmp_path / "ck")
    out = str(tmp_path / "out.nc")
    args = ["keff", path, "--var", "q", "-N", "21", "--batch", "1",
            "--stem", stem, "--out", out]

    # subprocess pins CPU in-process (the env var alone is not honored by
    # this image's plugin) and disables x64 to match nothing — the CLI owns
    # its own precision flags
    code = ("import jax; jax.config.update('jax_platforms', 'cpu'); "
            "import sys; from xcontour_tpu.cli import main; "
            "sys.exit(main(sys.argv[1:]))")
    env = dict(os.environ)
    proc = subprocess.Popen([sys.executable, "-c", code, *args],
                            cwd="/root/repo", env=env,
                            stdout=subprocess.DEVNULL,
                            stderr=subprocess.DEVNULL)
    # kill as soon as a few chunks exist but before the archive completes
    deadline = time.time() + 300
    killed = False
    while time.time() < deadline and proc.poll() is None:
        done = len([f for f in os.listdir(tmp_path)
                    if f.startswith("ck_ck") and f.endswith(".npz")])
        if 2 <= done < T:
            proc.send_signal(signal.SIGKILL)
            killed = True
            break
        time.sleep(0.002)
    proc.wait(timeout=60)

    if killed:
        # mid-archive state: some chunks exist, not all; output never written
        partial = [f for f in os.listdir(tmp_path) if f.startswith("ck_ck")]
        assert 0 < len(partial) < T
        assert not os.path.exists(out)
    else:
        # box was fast enough to finish first — degrade to a torn archive by
        # deleting middle + trailing chunks (still exercises resume)
        assert proc.returncode == 0
        os.remove(stem + "_ck00007.npz")
        os.remove(stem + f"_ck{T - 1:05d}.npz")
        os.remove(out)

    # resume in-process with the identical fingerprint
    rc = cli.main(args)
    assert rc == 0
    got = _ld(out)

    # reference: one uninterrupted run, no checkpointing
    out2 = str(tmp_path / "ref.nc")
    rc = cli.main(["keff", path, "--var", "q", "-N", "21", "--batch", "1",
                   "--out", out2])
    assert rc == 0
    ref = _ld(out2)
    np.testing.assert_array_equal(got["nkeff"], ref["nkeff"])
    np.testing.assert_array_equal(got["Yeq"], ref["Yeq"])
