"""Scanned sharded fit (VERDICT r3 task 3): the whole sharded fit as ONE
jitted device program with per-sweep SSE riding the item half's solves —
no per-sweep host readbacks, no surplus exchanges.
"""

import numpy as np
import pytest

from recommendation_models_tpu.config import DataConfig, SolveConfig
from recommendation_models_tpu.data.layout import (
    build_layout, csr_arrays, layout_from_coo, shard_layout)
from recommendation_models_tpu.parallel.mesh import get_mesh, to_host
from recommendation_models_tpu.parallel.sharded_als import ShardedALSProgram

from conftest import tiny_problem


def _prog(n_shards=8, alpha=None, exchange="allgather", seed=0):
    R = tiny_problem(60, 44, density=0.3, seed=seed)
    indptr, indices, data, n_users, n_items = csr_arrays(R)
    rows = np.repeat(np.arange(n_users), np.diff(indptr))
    dcfg = (DataConfig(dense_whales=False, hot_cols=0)
            if exchange != "allgather" else None)
    mesh = get_mesh(n_shards, platform="cpu")
    cfg = SolveConfig(rank=6, reg=0.2, alpha=alpha, solver="xla",
                      compute_dtype="float32")
    ul = shard_layout(build_layout(indptr, indices, data, n_users, n_items,
                                   config=dcfg), n_shards)
    il = shard_layout(layout_from_coo(rows, indices, data, n_users, n_items,
                                      transpose=True, config=dcfg), n_shards)
    prog = ShardedALSProgram(ul, il, mesh, cfg, exchange=exchange,
                             head=8 if exchange == "hybrid" else 0)
    return prog, R


@pytest.mark.parametrize("alpha", [None, 0.8])
def test_sweep_with_sse_matches_train_sse(alpha):
    prog, _ = _prog(alpha=alpha)
    U, V = prog.init_factors(seed=1, init_scale=0.1)
    U2, V2 = prog.sweep(*prog.init_factors(seed=1, init_scale=0.1))
    ref_sse = float(prog.train_sse(U2, V2))
    U3, V3, sse = prog.sweep_with_sse(U, V)
    np.testing.assert_allclose(to_host(U3), to_host(U2), rtol=1e-5)
    np.testing.assert_allclose(float(sse), ref_sse, rtol=2e-4)


@pytest.mark.parametrize("alpha", [None, 0.8])
@pytest.mark.parametrize("exchange", ["allgather", "all_to_all"])
def test_make_fit_matches_stepwise(alpha, exchange):
    n_sweeps = 4
    prog, _ = _prog(alpha=alpha, exchange=exchange)
    fit = prog.make_fit(n_sweeps)
    U, V, hist, n_done = fit(*prog.init_factors(seed=2, init_scale=0.1))
    assert int(n_done) == n_sweeps

    Ur, Vr = prog.init_factors(seed=2, init_scale=0.1)
    ref_hist = []
    for _ in range(n_sweeps):
        Ur, Vr = prog.sweep(Ur, Vr)
        ref_hist.append(float(prog.train_sse(Ur, Vr)))
    np.testing.assert_allclose(to_host(U), to_host(Ur), rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(to_host(V), to_host(Vr), rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(hist), ref_hist, rtol=2e-4)


def test_sharded_sse_modes_agree():
    """The sharded program's riding identity and separate item-side
    masked_sse pass (config.sse_separate_for — a pure performance choice,
    r5) produce the same factors and the same history."""
    import dataclasses
    hists = {}
    for mode in ("riding", "separate"):
        R = tiny_problem(60, 44, density=0.3, seed=0)
        indptr, indices, data, n_users, n_items = csr_arrays(R)
        rows = np.repeat(np.arange(n_users), np.diff(indptr))
        mesh = get_mesh(8, platform="cpu")
        cfg = SolveConfig(rank=6, reg=0.2, solver="xla",
                          compute_dtype="float32", sse_mode=mode)
        ul = shard_layout(build_layout(indptr, indices, data, n_users,
                                       n_items), 8)
        il = shard_layout(layout_from_coo(rows, indices, data, n_users,
                                          n_items, transpose=True), 8)
        prog = ShardedALSProgram(ul, il, mesh, cfg)
        U, V, hist, _ = prog.make_fit(3)(
            *prog.init_factors(seed=2, init_scale=0.1))
        hists[mode] = (to_host(U), np.asarray(hist))
    np.testing.assert_allclose(hists["riding"][0], hists["separate"][0],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(hists["riding"][1], hists["separate"][1],
                               rtol=2e-4)


def test_make_fit_tol_stops_early():
    prog, R = _prog()
    nnz = R.nnz
    fit = prog.make_fit(30, tol=1e-3, nnz=nnz)
    U, V, hist, n_done = fit(*prog.init_factors(seed=0, init_scale=0.1))
    n_done = int(n_done)
    assert 2 <= n_done < 30
    hist = np.asarray(hist)
    assert np.all(hist[:n_done] >= 0)
    assert np.all(hist[n_done:] == -1.0)          # sweeps never run
    # the stopping rule held on the last two recorded sweeps
    rmse = np.sqrt(np.maximum(hist[:n_done], 0) / nnz)
    assert abs(rmse[-2] - rmse[-1]) < 1e-3


def test_estimator_sharded_fit_has_no_per_sweep_dispatch(monkeypatch):
    """tol=0 / verbose=0 / no checkpoints => the estimator must run the
    whole sharded fit as one program: per-sweep prog.sweep / train_sse
    calls are forbidden (VERDICT r3 weak #3's dispatch-counter assert)."""
    from recommendation_models_tpu.models.als import ALS

    def forbidden(self, *a, **kw):
        raise AssertionError("per-sweep host dispatch on the scanned path")

    monkeypatch.setattr(ShardedALSProgram, "sweep", forbidden)
    monkeypatch.setattr(ShardedALSProgram, "train_sse", forbidden)
    monkeypatch.setattr(ShardedALSProgram, "sweep_with_sse", forbidden)
    R = tiny_problem(48, 40, seed=3)
    m = ALS(rank=5, reg=0.2, n_sweeps=3, n_shards=8, platform="cpu",
            solver="xla", compute_dtype="float32").fit(R)
    assert len(m.history_) == 3
    assert m.U_.shape == (48, 5)


def test_estimator_sharded_history_matches_single_device():
    """End-to-end: the scanned sharded fit's history equals the
    single-device scanned fit's on the same seed/init."""
    from recommendation_models_tpu.models.als import ALS

    R = tiny_problem(52, 41, seed=4)
    rng = np.random.default_rng(5)
    U0 = 0.1 * rng.standard_normal((52, 6)).astype(np.float32)
    V0 = 0.1 * rng.standard_normal((41, 6)).astype(np.float32)
    kw = dict(rank=6, reg=0.2, n_sweeps=4, solver="xla",
              compute_dtype="float32")
    m1 = ALS(**kw).fit(R, U0=U0, V0=V0)
    m8 = ALS(**kw, n_shards=8, platform="cpu").fit(R, U0=U0, V0=V0)
    np.testing.assert_allclose(m1.history_, m8.history_, rtol=2e-4)
    np.testing.assert_allclose(m1.U_, m8.U_, rtol=1e-4, atol=1e-5)


def test_hybrid_make_fit_matches_stepwise():
    from recommendation_models_tpu.parallel.hybrid_als import HybridALSProgram
    from recommendation_models_tpu.parallel.mesh import get_hybrid_mesh

    R = tiny_problem(56, 42, density=0.3, seed=6)
    indptr, indices, data, n_users, n_items = csr_arrays(R)
    rows = np.repeat(np.arange(n_users), np.diff(indptr))
    dcfg = DataConfig(dense_whales=False, hot_cols=0)
    S, D = 4, 2
    mesh = get_hybrid_mesh(8, num_slices=D)
    cfg = SolveConfig(rank=5, reg=0.2, solver="xla",
                      compute_dtype="float32")
    ul = shard_layout(build_layout(indptr, indices, data, n_users, n_items,
                                   config=dcfg), S)
    il = shard_layout(layout_from_coo(rows, indices, data, n_users, n_items,
                                      transpose=True, config=dcfg), S)
    prog = HybridALSProgram(ul, il, mesh, cfg)

    n_sweeps = 3
    fit = prog.make_fit(n_sweeps)
    U, V, hist, n_done = fit(*prog.init_factors(seed=7, init_scale=0.1))
    assert int(n_done) == n_sweeps

    Ur, Vr = prog.init_factors(seed=7, init_scale=0.1)
    ref_hist = []
    for _ in range(n_sweeps):
        Ur, Vr = prog.sweep(Ur, Vr)
        ref_hist.append(float(prog.train_sse(Ur, Vr)))
    np.testing.assert_allclose(to_host(U), to_host(Ur), rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(hist), ref_hist, rtol=2e-4)
