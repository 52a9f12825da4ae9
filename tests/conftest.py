"""Test harness config (SURVEY.md §4.2).

Forces 8 virtual CPU devices (multi-device tests without a pod) and pins the
default device to CPU so tests are hermetic even when a real TPU is attached.
Must run before jax initializes a backend.

Hermeticity (VERDICT r3 weak #2): the remote-TPU plugin under
``/root/.axon_site`` registers via ``sitecustomize.py`` at interpreter
startup — it has ALREADY imported jax (with ``JAX_PLATFORMS=axon`` baked
into jax's config) by the time this conftest runs, so scrubbing the env
alone is too late. The effective override is ``jax.config.update
("jax_platforms", "cpu")``: backend *initialization* is lazy, so forcing
the platform list to cpu before the first ``jax.devices()`` call prevents
the axon PJRT client from ever dialing the (possibly wedged) tunnel. The
env scrub below still matters for subprocess workers, which inherit
``PYTHONPATH``/``JAX_PLATFORMS`` and must never load the plugin at all.
"""

import os
import sys

_AXON = "/root/.axon_site"
sys.path = [p for p in sys.path if _AXON not in p]
os.environ["PYTHONPATH"] = os.pathsep.join(
    p for p in os.environ.get("PYTHONPATH", "").split(os.pathsep)
    if p and _AXON not in p)
os.environ["JAX_PLATFORMS"] = "cpu"

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# jax may predate this conftest (sitecustomize import): override the baked
# platform list before any backend initializes. Safe in both orders.
jax.config.update("jax_platforms", "cpu")
import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_collection_modifyitems(config, items):
    """Auto-mark subprocess/fuzz/full-oracle tests slow (fast lane: -m "not slow")."""
    slow_files = {
        "test_multihost.py", "test_fuzz.py", "test_integration.py",
        "test_hot_columns.py",   # kernel-parity sweeps, ~40 s of the lane
        "test_examples.py",
    }
    for item in items:
        if os.path.basename(str(item.fspath)) in slow_files:
            item.add_marker(pytest.mark.slow)

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
