"""Test harness configuration.

Tests run on a virtual 8-device CPU mesh (no TPU pod needed) with x64 enabled
so reference-semantics parity can be asserted at float64 tolerances.  These
environment variables must be set before jax is imported anywhere.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon TPU plugin ignores the JAX_PLATFORMS env var in this image; the
# config update below reliably pins tests to the virtual CPU devices.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFDATA = "/root/reference/Data/barotropic_vorticity.nc"


@pytest.fixture(scope="session")
def vorticity():
    """The bundled 256x512 barotropic vorticity snapshot (verified fixture,
    SURVEY.md §2.3)."""
    from xcontour_tpu.utils.ncio import load_dataset
    ds = load_dataset(REFDATA)
    return (np.asarray(ds["latitude"], np.float64),
            np.asarray(ds["longitude"], np.float64),
            np.asarray(ds["absolute_vorticity"], np.float64))


@pytest.fixture()
def rng(request):
    """Per-test rng seeded from the test's node id.

    A session-scoped stream makes every test's draws depend on which tests
    ran before it — the source of a 1-in-N suite-order flake (round-3
    verdict item 2).  Deriving the seed from the node id makes each test's
    randomness identical under any collection order, -k selection, or
    parallel split, and still reproducible in isolation.
    """
    import zlib
    seed = zlib.crc32(request.node.nodeid.encode())
    return np.random.default_rng(seed)


def pytest_collection_modifyitems(config, items):
    """Opt-in shuffled collection order (TEST_SHUFFLE_SEED=<int>) to prove
    order independence — the round-3 flake only appeared under full-suite
    ordering."""
    seed = os.environ.get("TEST_SHUFFLE_SEED")
    if seed:
        np.random.default_rng(int(seed)).shuffle(items)
