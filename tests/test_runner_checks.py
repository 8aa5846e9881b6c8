"""Batch runner (checkpoint/resume) and checkify guard tests."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from xcontour_tpu.runner import run_batched, load_chunks
from xcontour_tpu.utils import checks


def _step(x):
    return {"mean": jnp.mean(x, axis=(-2, -1)), "double": x * 2}


def test_runner_in_memory(rng):
    snaps = rng.normal(size=(10, 8, 16))
    out = run_batched(jax.jit(_step), snaps, batch=4, log=lambda s: None)
    assert out["mean"].shape == (10,)
    np.testing.assert_allclose(out["mean"], snaps.mean(axis=(1, 2)), rtol=1e-6)
    np.testing.assert_allclose(out["double"], snaps * 2, rtol=1e-6)


def test_runner_resume(tmp_path, rng):
    snaps = rng.normal(size=(10, 8, 16))
    stem = str(tmp_path / "out")
    calls = []
    step = jax.jit(_step)

    def counting_step(x):
        calls.append(1)
        return step(x)

    run_batched(counting_step, snaps, batch=4, out_stem=stem,
                log=lambda s: None)
    assert len(calls) == 3
    # delete one chunk -> only that chunk recomputes
    os.remove(stem + "_ck00001.npz")
    run_batched(counting_step, snaps, batch=4, out_stem=stem,
                log=lambda s: None)
    assert len(calls) == 4
    out = load_chunks(stem)
    np.testing.assert_allclose(out["mean"], snaps.mean(axis=(1, 2)), rtol=1e-6)


def test_checkify_monotonic_guard():
    @jax.jit
    def f(a):
        checks.check_monotonic(a, name="area")
        return jnp.cumsum(a)

    checked = checks.checked(f)
    err, _ = checked(jnp.asarray([1.0, 2.0, 3.0]))
    err.throw()  # no error
    err, _ = checked(jnp.asarray([1.0, 1.0, 3.0]))
    with pytest.raises(Exception, match="monotonic"):
        err.throw()


def test_host_monotonic_guard():
    checks.assert_monotonic_host(np.array([1.0, 2.0, 3.0]))
    with pytest.raises(ValueError, match="monotonic"):
        checks.assert_monotonic_host(np.array([[1.0, 2.0], [2.0, 2.0]]))


# ---------------------------------------------------------------------------
# failure isolation (SURVEY.md §5 failure-detection row)
# ---------------------------------------------------------------------------
def _nan_poisoned(snaps, bad_chunk, batch):
    snaps = snaps.copy()
    snaps[bad_chunk * batch] = np.nan
    return snaps


def _validate_finite(out_np):
    for k, v in out_np.items():
        if not np.isfinite(v).all():
            raise ValueError(f"non-finite output in {k!r}")


def test_runner_skip_bad_chunk_in_memory(rng):
    """A NaN-poisoned chunk is retried, then NaN-filled; the rest of the
    archive survives with aligned time indices."""
    snaps = _nan_poisoned(rng.normal(size=(12, 8, 16)), bad_chunk=1, batch=4)
    attempts = []

    def step(x):
        attempts.append(1)
        return _step(x)

    out = run_batched(step, snaps, batch=4, log=lambda s: None,
                      retries=1, on_error="skip", retry_wait=0.0,
                      validate=_validate_finite)
    assert len(attempts) == 3 + 1          # 3 chunks + 1 retry of the bad one
    assert out["mean"].shape == (12,)
    assert np.isnan(out["mean"][4:8]).all()      # failed chunk NaN-filled
    good = np.r_[0:4, 8:12]
    np.testing.assert_allclose(out["mean"][good],
                               snaps[good].mean(axis=(1, 2)), rtol=1e-6)


def test_runner_raise_is_default(rng):
    snaps = _nan_poisoned(rng.normal(size=(8, 8, 16)), bad_chunk=0, batch=4)
    with pytest.raises(ValueError, match="non-finite"):
        run_batched(jax.jit(_step), snaps, batch=4, log=lambda s: None,
                    validate=_validate_finite)


def test_runner_failed_marker_and_resume_retry(tmp_path, rng):
    """File mode: the bad chunk leaves a structured .failed record,
    load_chunks refuses it by default / NaN-fills on request, and a resumed
    run with the poison removed repairs the archive and clears the marker."""
    snaps = _nan_poisoned(rng.normal(size=(12, 8, 16)), bad_chunk=2, batch=4)
    stem = str(tmp_path / "era")
    run_batched(jax.jit(_step), snaps, batch=4, out_stem=stem,
                log=lambda s: None, on_error="skip", retry_wait=0.0,
                validate=_validate_finite)
    marker = stem + "_ck00002.failed"
    assert os.path.exists(marker)
    with pytest.raises(RuntimeError, match="failed chunk"):
        load_chunks(stem)
    out = load_chunks(stem, allow_failed=True)
    assert out["mean"].shape == (12,) and np.isnan(out["mean"][8:]).all()

    # repair the data and resume: only the failed chunk recomputes
    calls = []
    fixed = snaps.copy()
    fixed[8] = 0.0

    def counting_step(x):
        calls.append(1)
        return _step(x)

    run_batched(counting_step, fixed, batch=4, out_stem=stem,
                log=lambda s: None, on_error="skip", retry_wait=0.0,
                validate=_validate_finite)
    assert len(calls) == 1
    assert not os.path.exists(marker)
    out = load_chunks(stem)
    assert np.isfinite(out["mean"]).all()


def test_runner_checkify_guard_surfaces_in_record(tmp_path, rng):
    """An in-jit checkify guard (utils.checks) rejects a chunk through the
    validate hook and its message lands in the .failed record."""
    snaps = rng.normal(size=(8, 8, 16))
    snaps[5] = 7.0                                  # constant row -> zero diff

    checked_step = checks.checked(
        jax.jit(lambda x: (checks.check_monotonic(x, axis=-1, name="tracer"),
                           _step(x))[1]))

    def step_with_guard(x):
        err, out = checked_step(x)
        err.throw()
        return out

    stem = str(tmp_path / "guard")
    run_batched(step_with_guard, snaps, batch=4, out_stem=stem,
                log=lambda s: None, on_error="skip", retry_wait=0.0)
    import json as _json
    with open(stem + "_ck00001.failed") as f:
        rec = _json.load(f)
    assert "monotonic" in rec["error"]
    assert rec["chunk"] == 1 and rec["nvalid"] == 4


def test_contour2d_check_mono_unified():
    """The object API's opt-in guard routes through checks.check_monotonic:
    eager calls raise immediately on a degenerate (constant) tracer whose
    area table has zero differences; check_mono=False stays silent (VERDICT
    r2 weak-7 unification — no full-array host sync in the guard)."""
    from xcontour_tpu.core import Contour2D
    Ny, Nx = 8, 12
    dA = np.ones((Ny, Nx))
    ydef = np.linspace(-60, 60, Ny)
    flat = np.ones((Ny, Nx))          # constant tracer -> constant integrals
    c = Contour2D.from_arrays(flat, dA, ydef, increase=True, lt=True,
                              check_mono=True, dtype=jnp.float64)
    ctr = jnp.linspace(0.0, 2.0, 5)
    with pytest.raises(Exception, match="monotonic"):
        c.cal_integral_within_contours(ctr)
    c2 = Contour2D.from_arrays(flat, dA, ydef, increase=True, lt=True,
                               check_mono=False, dtype=jnp.float64)
    c2.cal_integral_within_contours(ctr)  # silent


def test_load_chunks_detects_index_gap(tmp_path, rng):
    snaps = rng.normal(size=(10, 8, 16))
    stem = str(tmp_path / "gap")
    run_batched(jax.jit(_step), snaps, batch=4, out_stem=stem,
                log=lambda s: None)
    # a deleted middle chunk with no .failed marker must not silently
    # misalign the reassembled time axis
    os.remove(stem + "_ck00001.npz")
    with pytest.raises(RuntimeError, match="gap"):
        load_chunks(stem)
    run_batched(jax.jit(_step), snaps, batch=4, out_stem=stem,
                log=lambda s: None)  # resume regenerates the hole
    out = load_chunks(stem)
    np.testing.assert_allclose(out["mean"], snaps.mean(axis=(1, 2)),
                               rtol=1e-6)
