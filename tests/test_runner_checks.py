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
