"""Test harness config (SURVEY.md §4.2).

Forces 8 virtual CPU devices (multi-device tests without a pod) and pins the
default device to CPU so tests are hermetic even when a real TPU is attached.
Must run before jax initializes a backend.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

jax.config.update("jax_default_device", jax.devices("cpu")[0])
# Numerics guard (SURVEY.md §5 'race detection / sanitizers' row): NaN checks
# in tests.
jax.config.update("jax_debug_nans", True)


@pytest.fixture(scope="session")
def cpu_devices():
    return jax.devices("cpu")


@pytest.fixture(scope="session")
def cpu_mesh():
    from recommendation_models_tpu.parallel.mesh import get_mesh
    return get_mesh(8, platform="cpu")


@pytest.fixture()
def rng():
    return np.random.default_rng(0)


def tiny_problem(n_users=50, n_items=40, density=0.25, seed=0):
    """Random small rating matrix as scipy CSR (the §4.2-1 parity shape)."""
    import scipy.sparse as sp
    rng = np.random.default_rng(seed)
    mask = rng.random((n_users, n_items)) < density
    vals = rng.uniform(1.0, 5.0, size=mask.sum()).astype(np.float32)
    rows, cols = np.nonzero(mask)
    return sp.csr_matrix((vals, (rows, cols)), shape=(n_users, n_items))


@pytest.fixture()
def tiny_ratings():
    return tiny_problem()
