"""Oracle parity — the backbone tests (SURVEY.md §4.2-1).

Single jitted half-sweep and full fits must match the bundled
reference-faithful NumPy/SciPy oracle on random 50x40 rank-6 problems.
"""

import numpy as np
import jax.numpy as jnp
import pytest
import scipy.sparse as sp

from recommendation_models_tpu.config import SolveConfig
from recommendation_models_tpu.data.layout import build_layout
from recommendation_models_tpu.models.als import ALS
from recommendation_models_tpu.oracle.als_numpy import OracleALS
from recommendation_models_tpu.solver.als_sweep import device_buckets, half_sweep
from tests.conftest import tiny_problem

RANK = 6


def _init(n_users, n_items, seed=0):
    rng = np.random.default_rng(seed)
    U = 0.1 * rng.standard_normal((n_users, RANK)).astype(np.float32)
    V = 0.1 * rng.standard_normal((n_items, RANK)).astype(np.float32)
    return U, V


@pytest.mark.parametrize("alpha", [None, 0.5])
def test_half_sweep_matches_oracle(alpha):
    R = tiny_problem(50, 40, density=0.25, seed=7)
    _, V = _init(*R.shape, seed=1)
    cfg = SolveConfig(rank=RANK, reg=0.3, alpha=alpha)
    layout = build_layout(R.indptr, R.indices, R.data, *R.shape)
    buckets = device_buckets(layout)
    U_tpu = np.asarray(half_sweep(jnp.asarray(V), buckets, R.shape[0], cfg))

    oracle = OracleALS(rank=RANK, reg=0.3, alpha=alpha)
    U_ref = oracle.half_sweep(R, V)
    np.testing.assert_allclose(U_tpu, U_ref, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("alpha", [None, 0.5])
def test_full_fit_matches_oracle(alpha):
    R = tiny_problem(50, 40, density=0.25, seed=8)
    U0, V0 = _init(*R.shape, seed=2)

    model = ALS(rank=RANK, reg=0.3, alpha=alpha, n_sweeps=4).fit(R, U0=U0, V0=V0)
    oracle = OracleALS(rank=RANK, reg=0.3, alpha=alpha, n_sweeps=4).fit(
        R, U0=U0, V0=V0)

    np.testing.assert_allclose(model.U_, oracle.U_, rtol=5e-3, atol=5e-3)
    np.testing.assert_allclose(model.V_, oracle.V_, rtol=5e-3, atol=5e-3)
    # RMSE parity well inside run-to-run variance
    assert abs(model.rmse(R) - oracle.train_rmse(R)) < 1e-3


def test_reg_by_degree_parity():
    R = tiny_problem(30, 25, density=0.3, seed=9)
    U0, V0 = _init(*R.shape, seed=3)
    model = ALS(rank=RANK, reg=0.05, reg_by_degree=True, n_sweeps=3).fit(
        R, U0=U0, V0=V0)
    oracle = OracleALS(rank=RANK, reg=0.05, reg_by_degree=True, n_sweeps=3).fit(
        R, U0=U0, V0=V0)
    np.testing.assert_allclose(model.U_, oracle.U_, rtol=5e-3, atol=5e-3)


def test_loss_monotone_nonincreasing():
    """Property (SURVEY.md §4.2-4): ALS objective decreases per sweep."""
    R = tiny_problem(60, 50, density=0.2, seed=10)
    model = ALS(rank=8, reg=0.1, n_sweeps=6).fit(R)
    h = model.history_
    assert all(h[i + 1] <= h[i] + 1e-5 for i in range(len(h) - 1))


def test_row_permutation_invariance():
    """Property: permuting user rows permutes factors identically."""
    R = tiny_problem(20, 15, density=0.4, seed=11)
    perm = np.random.default_rng(4).permutation(20)
    Rp = sp.csr_matrix(R.toarray()[perm])
    U0, V0 = _init(*R.shape, seed=5)
    m1 = ALS(rank=RANK, reg=0.2, n_sweeps=2).fit(R, U0=U0, V0=V0)
    m2 = ALS(rank=RANK, reg=0.2, n_sweeps=2).fit(Rp, U0=U0[perm], V0=V0)
    np.testing.assert_allclose(m1.U_[perm], m2.U_, rtol=1e-3, atol=1e-3)


def test_tol_early_stop():
    R = tiny_problem(30, 25, density=0.3, seed=12)
    model = ALS(rank=4, reg=0.5, n_sweeps=50, tol=1e-3).fit(R)
    assert len(model.history_) < 50


@pytest.mark.parametrize("alpha", [None, 0.5])
def test_tol_device_loop_matches_stepwise(alpha):
    """tol > 0 runs as a device-side while_loop (zero host round-trips);
    it must stop at the same sweep with the same history as the stepwise
    host loop (verbose forces stepwise)."""
    R = tiny_problem(40, 30, seed=41)
    dev = ALS(rank=4, reg=0.5, alpha=alpha, n_sweeps=50, tol=1e-3,
              seed=3).fit(R)
    host = ALS(rank=4, reg=0.5, alpha=alpha, n_sweeps=50, tol=1e-3, seed=3,
               verbose=1).fit(R)
    assert len(dev.history_) == len(host.history_) < 50
    # the scanned path reads SSE out of the item half-sweep, the
    # stepwise path recomputes masked_sse: ~1e-5-relative differences
    np.testing.assert_allclose(dev.history_, host.history_, rtol=5e-4)
    np.testing.assert_allclose(dev.U_, host.U_, rtol=1e-4, atol=1e-5)
