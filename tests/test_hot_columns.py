"""Hot-column dense slab (layout.py hot_ids / Bucket.hot_vals).

The C most popular columns' observations leave the gather buckets for
per-bucket (B, C) f16 slabs whose gram contribution is one MXU matmul
against the C outer products. These tests pin: the layout partition
(every observation lands in exactly one of buckets/dense/hot), solver
equivalence vs the hot-disabled path, SSE consistency, and both objectives.
"""

import numpy as np
import pytest

from recommendation_models_tpu.config import DataConfig, SolveConfig
from recommendation_models_tpu.data.layout import layout_from_coo


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def _skewed_problem(rng, n_users=120, n_items=90, n_obs=3000):
    """COO triplets with a Zipf-ish column head so hot columns trigger."""
    users = rng.integers(0, n_users, n_obs)
    pop = (np.arange(1, n_items + 1) ** -1.0)
    pop /= pop.sum()
    items = rng.choice(n_items, size=n_obs, p=pop)
    key = users * n_items + items
    uniq = np.unique(key)
    users, items = (uniq // n_items).astype(np.int64), (uniq % n_items)
    # half-star ratings: exact in float16 so hot/dense f16 storage is lossless
    vals = (rng.integers(1, 11, uniq.shape[0]) * 0.5).astype(np.float32)
    return users, items, vals


def test_hot_partition_and_slab_values(rng):
    users, items, vals = _skewed_problem(rng)
    n_users, n_items = 120, 90
    cfg = DataConfig(hot_cols=16, hot_min_count=5, dense_whales=False)
    layout = layout_from_coo(users, items, vals, n_users, n_items, config=cfg)
    assert layout.hot_ids is not None
    C = layout.hot_ids.shape[0]
    assert C % 8 == 0 and C <= 16
    hot_set = set(layout.hot_ids.tolist())

    # rebuild the full matrix from buckets + hot slabs; compare to the truth
    R = np.zeros((n_users, n_items), np.float64)
    for b in layout.buckets:
        for r in range(b.row_ids.shape[0]):
            u = b.row_ids[r]
            if u >= n_users:
                assert b.mask[r].sum() == 0
                if b.hot_vals is not None:
                    assert np.count_nonzero(b.hot_vals[r]) == 0
                continue
            sel = b.mask[r] > 0
            assert not any(int(c) in hot_set for c in b.indices[r][sel]), \
                "hot column leaked into a gather bucket"
            R[u, b.indices[r][sel]] += b.values[r][sel]
            if b.hot_vals is not None:
                nz = np.flatnonzero(b.hot_vals[r])
                R[u, layout.hot_ids[nz]] += b.hot_vals[r][nz].astype(np.float64)
    truth = np.zeros((n_users, n_items), np.float64)
    truth[users, items] = vals
    np.testing.assert_allclose(R, truth, rtol=0, atol=0)


def test_hot_counts_respect_threshold(rng):
    users, items, vals = _skewed_problem(rng)
    cfg = DataConfig(hot_cols=64, hot_min_count=30, dense_whales=False)
    layout = layout_from_coo(users, items, vals, 120, 90, config=cfg)
    counts = np.bincount(items, minlength=90)
    if layout.hot_ids is not None:
        assert (counts[layout.hot_ids] >= 30).all()


@pytest.mark.parametrize("alpha", [None, 10.0])
@pytest.mark.parametrize("solver", ["xla", "pallas"])
def test_half_sweep_matches_no_hot(rng, alpha, solver):
    """Hot path (fused Pallas kernel in interpret mode / XLA fallback)
    must match the hot-disabled solve."""
    import jax.numpy as jnp
    from recommendation_models_tpu.solver.als_sweep import (
        device_buckets, half_sweep)

    users, items, vals = _skewed_problem(rng)
    n_users, n_items = 120, 90
    k = 8 if solver == "pallas" else 6
    scfg = SolveConfig(rank=k, reg=0.1, alpha=alpha, solver=solver,
                       compute_dtype="float32")
    base = layout_from_coo(users, items, vals, n_users, n_items,
                           config=DataConfig(hot_cols=0, dense_whales=False))
    hot = layout_from_coo(users, items, vals, n_users, n_items,
                          config=DataConfig(hot_cols=16, hot_min_count=5,
                                            dense_whales=False))
    assert hot.hot_ids is not None
    V = jnp.asarray(rng.standard_normal((n_items, k)), jnp.float32)
    U_base = np.asarray(half_sweep(V, device_buckets(base), n_users, scfg))
    U_hot = np.asarray(half_sweep(V, device_buckets(hot), n_users, scfg))
    np.testing.assert_allclose(U_hot, U_base, rtol=2e-5, atol=2e-5)


def test_fused_sse_matches_masked_sse_with_hot(rng):
    import jax.numpy as jnp
    from recommendation_models_tpu.solver.als_sweep import (
        device_buckets, half_sweep, masked_sse)

    users, items, vals = _skewed_problem(rng)
    n_users, n_items = 120, 90
    k = 5
    scfg = SolveConfig(rank=k, reg=0.05, solver="xla",
                       compute_dtype="float32")
    dcfg = DataConfig(hot_cols=16, hot_min_count=5)
    ul = layout_from_coo(users, items, vals, n_users, n_items, config=dcfg)
    il = layout_from_coo(users, items, vals, n_users, n_items,
                         transpose=True, config=dcfg)
    ub, ib = device_buckets(ul), device_buckets(il)
    U2 = half_sweep(jnp.asarray(0.1 * rng.standard_normal((n_items, k)),
                                jnp.float32), ub, n_users, scfg)
    V2, sse_fused = half_sweep(U2, ib, n_items, scfg, with_sse=True)
    sse_ref = masked_sse(U2, V2, ub)
    np.testing.assert_allclose(float(sse_fused), float(sse_ref),
                               rtol=1e-4, atol=1e-2)
    # and against a plain dense-numpy SSE
    Ud, Vd = np.asarray(U2, np.float64), np.asarray(V2, np.float64)
    pred = (Ud @ Vd.T)[users, items]
    sse_np = float(((vals - pred) ** 2).sum())
    np.testing.assert_allclose(float(sse_fused), sse_np, rtol=1e-4,
                               atol=1e-2)


def test_full_fit_quality_with_hot(rng):
    import scipy.sparse as sp
    from recommendation_models_tpu.models.als import ALS

    users, items, vals = _skewed_problem(rng, n_obs=4000)
    R = sp.csr_matrix((vals, (users, items)), shape=(120, 90))
    m = ALS(rank=8, reg=0.05, n_sweeps=5, seed=0, platform="cpu").fit(R)
    assert m.history_[-1] < m.history_[0]
    assert np.isfinite(m.history_).all()
