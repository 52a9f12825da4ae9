"""IMC estimator tests (SURVEY.md §4.2; BASELINE.json config 4)."""

import numpy as np
import pytest

from recommendation_models_tpu import IMC
from recommendation_models_tpu.data.synthetic import (
    synthetic_imc_ratings, synthetic_side_features,
)
from recommendation_models_tpu.oracle.imc_numpy import OracleIMC


@pytest.fixture(scope="module")
def imc_problem():
    X, Y = synthetic_side_features(60, 50, d_user=12, d_item=10, seed=1)
    users, items, r, W, H = synthetic_imc_ratings(X, Y, n_obs=900, rank=4,
                                                  noise=0.02, seed=2)
    return X, Y, users, items, r


def test_objective_decreases(imc_problem):
    X, Y, users, items, r = imc_problem
    m = IMC(rank=4, reg=0.05, n_sweeps=5, cg_iters=30).fit(
        (users, items, r), X, Y)
    h = m.history_
    assert all(h[i + 1] <= h[i] + 1e-3 for i in range(len(h) - 1))
    assert m.rmse((users, items, r)) < 0.2


def test_oracle_parity(imc_problem):
    """Same init + same algorithm => matching trajectories (SURVEY.md §3.3:
    parity is objective-level)."""
    X, Y, users, items, r = imc_problem
    rng = np.random.default_rng(3)
    W0 = 0.1 * rng.standard_normal((X.shape[1], 4))
    H0 = 0.1 * rng.standard_normal((Y.shape[1], 4))

    m = IMC(rank=4, reg=0.1, n_sweeps=3, cg_iters=25).fit(
        (users, items, r), X, Y, W0=W0, H0=H0)
    o = OracleIMC(rank=4, reg=0.1, n_sweeps=3, cg_iters=25).fit(
        users, items, r, X, Y, W0=W0, H0=H0)

    pred_m = m.predict(users[:50], items[:50])
    pred_o = o.predict(users[:50], items[:50], np.asarray(X, np.float64),
                       np.asarray(Y, np.float64))
    np.testing.assert_allclose(pred_m, pred_o, rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(m.history_, o.history_, rtol=2e-2)


def test_cold_start_generalization(imc_problem):
    """Inductive property: predicts for users never seen in training, via
    side features (reference §2.1 row 7 'handles cold-start')."""
    X, Y, users, items, r = imc_problem
    train = users < 50  # hold out users 50..59 entirely
    m = IMC(rank=4, reg=0.05, n_sweeps=6, cg_iters=30).fit(
        (users[train], items[train], r[train]), X, Y)
    cold = ~train
    if cold.sum() == 0:
        pytest.skip("no cold users sampled")
    rmse_cold = m.rmse((users[cold], items[cold], r[cold]))
    # far better than predicting the mean (std of r ~ signal scale)
    assert rmse_cold < np.std(r) * 0.7


def test_sharded_imc_matches_single(imc_problem, cpu_mesh):
    X, Y, users, items, r = imc_problem
    rng = np.random.default_rng(4)
    W0 = 0.1 * rng.standard_normal((X.shape[1], 4))
    H0 = 0.1 * rng.standard_normal((Y.shape[1], 4))
    # cg_iters=32: single-device and sharded agree to ~6e-4 once CG has
    # converged; at ~20 iters the unconverged directions differ by
    # psum/summation order. (Was 20 when _cg over-ran the iteration count
    # by rounding up to restart blocks — 20 then silently meant 32.)
    m1 = IMC(rank=4, reg=0.1, n_sweeps=2, cg_iters=32).fit(
        (users, items, r), X, Y, W0=W0, H0=H0)
    m8 = IMC(rank=4, reg=0.1, n_sweeps=2, cg_iters=32, n_shards=8,
             platform="cpu").fit((users, items, r), X, Y, W0=W0, H0=H0)
    np.testing.assert_allclose(m8.W_, m1.W_, rtol=5e-3, atol=5e-3)
    np.testing.assert_allclose(m8.H_, m1.H_, rtol=5e-3, atol=5e-3)


def test_sharded_imc_serving_matches_single_device(imc_problem, cpu_mesh):
    """After a sharded fit, recommend() serves from the mesh (row-sharded
    projected catalog through ops.topk.sharded_topk — VERDICT r4 weak #3)
    and must return exactly what single-device serving returns for the
    same factors (exact method => bit-comparable item sets)."""
    X, Y, users, items, r = imc_problem
    m = IMC(rank=4, reg=0.1, n_sweeps=2, cg_iters=32, n_shards=8,
            platform="cpu").fit((users, items, r), X, Y)
    assert m._fit_sharded_
    uq = np.arange(10)
    sc_sh, it_sh = m.recommend(uq, n=7, exclude_seen=True, method="exact")
    # the sharded path actually ran (and cached the sharded catalog)
    assert m._veff_dev_cache is not None
    # same factors, forced single-device serving
    m._fit_sharded_ = False
    sc_1d, it_1d = m.recommend(uq, n=7, exclude_seen=True, method="exact")
    np.testing.assert_array_equal(it_sh, it_1d)
    np.testing.assert_allclose(sc_sh, sc_1d, rtol=1e-5, atol=1e-6)
    # exclusion held on the sharded path too
    for i, u in enumerate(uq):
        assert not set(it_sh[i].tolist()) & set(items[users == u].tolist())
    # no-exclusion path parity as well
    m._fit_sharded_ = True
    sc_sh2, it_sh2 = m.recommend(uq, n=5, exclude_seen=False,
                                 method="exact")
    m._fit_sharded_ = False
    sc_1d2, it_1d2 = m.recommend(uq, n=5, exclude_seen=False,
                                 method="exact")
    np.testing.assert_array_equal(it_sh2, it_1d2)
    # a fresh-Y catalog bypasses the sharded cache (training ids don't
    # address the new catalog) and still serves
    m._fit_sharded_ = True
    Y2 = np.random.default_rng(3).standard_normal((30, Y.shape[1])
                                                  ).astype(np.float32)
    sc_f, it_f = m.recommend(uq, n=5, Y=Y2, method="exact")
    assert it_f.max() < 30
    # pickling drops the device caches and still serves after reload
    import pickle
    m2 = pickle.loads(pickle.dumps(m))
    sc_p, it_p = m2.recommend(uq, n=7, exclude_seen=True, method="exact")
    np.testing.assert_array_equal(it_p, it_sh)


def test_imc_accepts_sparse_matrix(imc_problem):
    import scipy.sparse as sp
    X, Y, users, items, r = imc_problem
    R = sp.csr_matrix((r, (users, items)), shape=(X.shape[0], Y.shape[0]))
    m = IMC(rank=4, n_sweeps=2, cg_iters=10).fit(R, X, Y)
    assert np.isfinite(m.history_).all()
    s, items_rec = m.recommend([0, 1], n=5)
    assert items_rec.shape == (2, 5)


def test_imc_tol_early_stop(imc_problem):
    X, Y, users, items, r = imc_problem
    m = IMC(rank=4, reg=0.05, n_sweeps=30, tol=1.0, cg_iters=30).fit(
        (users, items, r), X, Y)
    # loose tol must stop well before 30 sweeps; history only holds run sweeps
    assert 2 <= len(m.history_) < 30
    deltas = np.abs(np.diff(m.history_))
    assert deltas[-1] < 1.0


def test_imc_checkpoint_resume(imc_problem, tmp_path):
    X, Y, users, items, r = imc_problem
    rng = np.random.default_rng(5)
    W0 = 0.1 * rng.standard_normal((X.shape[1], 4))
    H0 = 0.1 * rng.standard_normal((Y.shape[1], 4))
    d = str(tmp_path / "ckpt")
    full = IMC(rank=4, reg=0.1, n_sweeps=4, cg_iters=20,
               checkpoint_dir=d, checkpoint_every=2).fit(
        (users, items, r), X, Y, W0=W0, H0=H0)
    fresh = IMC(rank=4, reg=0.1, cg_iters=20, checkpoint_dir=d)
    step = fresh.resume()
    assert step == 4
    np.testing.assert_allclose(fresh.W_, full.W_)
    np.testing.assert_allclose(fresh.H_, full.H_)
    np.testing.assert_allclose(fresh.history_, full.history_, rtol=1e-6)
    # resumed-continue path: 2 sweeps from the step-2 ckpt == 4-sweep run
    two = IMC(rank=4, reg=0.1, cg_iters=20, checkpoint_dir=d)
    from recommendation_models_tpu.utils.checkpoint import load_checkpoint
    st = load_checkpoint(d, 2)
    cont = IMC(rank=4, reg=0.1, n_sweeps=2, cg_iters=20).fit(
        (users, items, r), X, Y, W0=st["W"], H0=st["H"])
    np.testing.assert_allclose(cont.W_, full.W_, rtol=1e-4, atol=1e-5)


def test_imc_layout_cache(imc_problem, tmp_path):
    X, Y, users, items, r = imc_problem
    prefix = str(tmp_path / "lay")
    m1 = IMC(rank=4, n_sweeps=2, cg_iters=10, layout_cache=prefix).fit(
        (users, items, r), X, Y)
    import glob
    assert glob.glob(prefix + ".imc.*.user.npz")
    m2 = IMC(rank=4, n_sweeps=2, cg_iters=10, layout_cache=prefix).fit(
        (users, items, r), X, Y)          # second fit loads from cache
    np.testing.assert_allclose(m1.W_, m2.W_)


def test_imc_layout_cache_invalidated_on_different_data(imc_problem, tmp_path):
    """Refitting the SAME cache prefix on DIFFERENT observations must not
    reuse the stale layout (VERDICT r2 weak item 1: the tag now carries a
    data fingerprint, mirroring ALS)."""
    import glob
    X, Y, users, items, r = imc_problem
    prefix = str(tmp_path / "lay")
    IMC(rank=4, n_sweeps=2, cg_iters=15, layout_cache=prefix).fit(
        (users, items, r), X, Y)
    n_before = len(glob.glob(prefix + "*.npz"))
    # same shapes, different observations
    rng = np.random.default_rng(99)
    perm = rng.permutation(users.shape[0])[: users.shape[0] // 2]
    u2, i2, r2 = users[perm], items[perm], r[perm]
    m2 = IMC(rank=4, n_sweeps=2, cg_iters=15, layout_cache=prefix).fit(
        (u2, i2, r2), X, Y)
    assert len(glob.glob(prefix + "*.npz")) == 2 * n_before
    ref = IMC(rank=4, n_sweeps=2, cg_iters=15).fit((u2, i2, r2), X, Y)
    np.testing.assert_allclose(m2.W_, ref.W_, rtol=1e-5, atol=1e-6)


def test_imc_layout_cache_invalidated_on_resized_tables(imc_problem,
                                                        tmp_path):
    """Same observation triplets but GROWN feature tables (new cold-start
    rows appended) must rebuild the layout — the fingerprint includes the
    table sizes (round-3 review: the triplets alone don't encode them)."""
    import glob
    X, Y, users, items, r = imc_problem
    prefix = str(tmp_path / "lay")
    IMC(rank=4, n_sweeps=2, cg_iters=15, layout_cache=prefix).fit(
        (users, items, r), X, Y)
    n_before = len(glob.glob(prefix + "*.npz"))
    X2 = np.vstack([X, np.zeros((5, X.shape[1]), np.float32)])
    m2 = IMC(rank=4, n_sweeps=2, cg_iters=15, layout_cache=prefix).fit(
        (users, items, r), X2, Y)
    assert len(glob.glob(prefix + "*.npz")) == 2 * n_before
    ref = IMC(rank=4, n_sweeps=2, cg_iters=15).fit((users, items, r), X2, Y)
    np.testing.assert_allclose(m2.W_, ref.W_, rtol=1e-5, atol=1e-6)


def test_imc_resumed_recommend_behavior(imc_problem, tmp_path):
    """A resumed IMC (no training features/indices): recommend() raises a
    clear error without X/Y, and with them WARNS that exclude_seen cannot
    be honored (round-3 review: parity with the ALS warning)."""
    import pytest as _pytest
    X, Y, users, items, r = imc_problem
    IMC(rank=4, n_sweeps=2, cg_iters=15, checkpoint_dir=str(tmp_path),
        checkpoint_every=1).fit((users, items, r), X, Y)
    m2 = IMC(rank=4, checkpoint_dir=str(tmp_path))
    m2.resume()
    with _pytest.raises(RuntimeError, match="feature matrices"):
        m2.recommend([0], n=3)
    with _pytest.warns(UserWarning, match="exclude_seen"):
        m2.recommend([0], n=3, X=X, Y=Y, exclude_seen=True)


def test_sharded_imc_stepwise_matches_scan(imc_problem, cpu_mesh):
    # verbose forces the per-sweep length-1 program; must equal the
    # whole-fit scan (and exercises checkpointing on the sharded path)
    X, Y, users, items, r = imc_problem
    rng = np.random.default_rng(6)
    W0 = 0.1 * rng.standard_normal((X.shape[1], 4))
    H0 = 0.1 * rng.standard_normal((Y.shape[1], 4))
    kw = dict(rank=4, reg=0.1, n_sweeps=2, cg_iters=20, n_shards=8,
              platform="cpu")
    scan = IMC(**kw).fit((users, items, r), X, Y, W0=W0, H0=H0)
    step = IMC(**kw, verbose=1).fit((users, items, r), X, Y, W0=W0, H0=H0)
    np.testing.assert_allclose(step.W_, scan.W_, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(step.history_, scan.history_, rtol=1e-5)


def test_imc_recommend_topk_path(imc_problem):
    """recommend() serves through the shared top-k retrieval path on the
    PROJECTED factors; exclusion and cold-start queries behave."""
    X, Y, users, items, r = imc_problem
    m = IMC(rank=4, reg=0.1, n_sweeps=3, cg_iters=20, seed=0).fit(
        (users, items, r), X, Y)
    uq = np.unique(users)[:8]
    sc, it = m.recommend(uq, n=5, method="exact")
    # exact-mode parity with the dense bilinear argsort reference
    s_ref = (X[uq] @ m.W_) @ (Y @ m.H_).T
    np.testing.assert_allclose(sc[:, 0], s_ref.max(1), rtol=1e-5)
    assert it.shape == (uq.shape[0], 5)

    # exclusion removes training items for in-training users
    _, it_ex = m.recommend(uq, n=5, exclude_seen=True, method="exact")
    for i, u in enumerate(uq):
        seen = set(items[users == u].tolist())
        assert not set(it_ex[i].tolist()) & seen

    # cold-start: fresh feature rows (different user space) still serve
    Xc = np.random.default_rng(0).standard_normal((3, X.shape[1])
                                                  ).astype(np.float32)
    sc_c, it_c = m.recommend([0, 1, 2], n=4, X=Xc, exclude_seen=True,
                             method="exact")
    s_ref_c = (Xc @ m.W_) @ (Y @ m.H_).T
    np.testing.assert_allclose(sc_c[:, 0], s_ref_c.max(1), rtol=1e-5)

    # single-user convenience
    assert m.top_n(int(uq[0]), 3).shape == (3,)

    # predict_all parity with the dense bilinear row (reference §2.1 row 8)
    np.testing.assert_allclose(m.predict_all(int(uq[0])), s_ref[0],
                               rtol=1e-5, atol=1e-6)


def test_imc_device_side_tol_matches_host_loop(imc_problem, capsys):
    """Single-device tol runs as a device while_loop (zero per-sweep
    readbacks, r4); its stopping point and history must match the host
    stepwise loop (verbose=1 forces it) on the same problem."""
    X, Y, users, items, r = imc_problem
    kw = dict(rank=4, reg=0.05, n_sweeps=30, cg_iters=25, tol=2.0, seed=0)
    dev = IMC(**kw).fit((users, items, r), X, Y)
    host = IMC(**kw, verbose=1).fit((users, items, r), X, Y)
    capsys.readouterr()
    assert 2 <= len(dev.history_) < 30          # actually stopped early
    assert len(dev.history_) == len(host.history_)
    np.testing.assert_allclose(dev.history_, host.history_, rtol=1e-5)
    assert abs(dev.history_[-2] - dev.history_[-1]) < 2.0


def test_cg_honors_iteration_count():
    """ADVICE r3: cg_iters=50, restart=16 used to run 64 steps. Count
    matvecs: exactly iters + ceil(iters/restart) true-residual extras."""
    import jax.numpy as jnp
    from recommendation_models_tpu.models.imc import _cg, cg_matvec_count

    A = np.diag(np.linspace(1.0, 3.0, 6)).astype(np.float32)
    b = np.ones(6, np.float32)
    calls = {"n": 0}

    def matvec(x):
        calls["n"] += 1                 # traced once per lax call site:
        return jnp.asarray(A) @ x       # count OUTSIDE jit (pure python)

    # run untraced (no jit wrapper) so the python counter sees every call;
    # fori_loop bodies trace once per restarted() invocation, so count the
    # *block structure* instead: each block = 1 true-residual + 1 traced
    # body. Validate via the analytic helper + distinct block lengths.
    for iters, restart in ((50, 16), (16, 16), (5, 16), (32, 8)):
        assert cg_matvec_count(iters, restart) == iters + -(-iters // restart)
    # numerical check: the solve actually converges with the exact count
    x = _cg(matvec, jnp.asarray(b), jnp.zeros(6, jnp.float32), 12)
    np.testing.assert_allclose(np.asarray(x), np.linalg.solve(A, b),
                               rtol=1e-5)


def test_sharded_imc_exchange_bytes(imc_problem, cpu_mesh):
    """VERDICT r3 task 5a: the sharded IMC runner exposes analytic
    per-sweep collective traffic like ALS's (gathered rank-wide projection
    blocks + dense (d, k) CG psums)."""
    X, Y, users, items, r = imc_problem
    m = IMC(rank=4, reg=0.1, n_sweeps=1, cg_iters=10, n_shards=8,
            platform="cpu").fit((users, items, r), X, Y)
    b = m.exchange_bytes_per_sweep_
    assert set(b) == {"w_step", "h_step", "per_sweep_total"}
    assert b["per_sweep_total"] == b["w_step"] + b["h_step"] > 0
    # reproduce the w_step identity: (S-1) gathered (ipr, k) blocks + the
    # ring-psum'd (d_user, k) dense reductions
    from recommendation_models_tpu.models.imc import cg_matvec_count
    S, k, d_user = 8, 4, X.shape[1]
    ipr = -(-Y.shape[0] // S)
    mv = cg_matvec_count(10)
    expect = ((S - 1) * ipr * k * 4
              + int(2 * (S - 1) / S * 4 * (d_user * k * (mv + 1) + 2)))
    assert b["w_step"] == expect


def test_imc_recommend_whale_batch_and_veff_cache():
    """(a) A whale user in the batch must not break exclusion for anyone
    (degree-bucketed path, shared with ALS — VERDICT r2 weak item 2);
    (b) the projected catalog Y @ H_ is cached across recommend() calls and
    invalidated by refit."""
    rng = np.random.default_rng(7)
    n_users, n_items = 40, 120
    X = rng.standard_normal((n_users, 8)).astype(np.float32)
    Y = rng.standard_normal((n_items, 6)).astype(np.float32)
    # user 0 is a whale: rated almost the whole catalog
    whale_items = np.arange(110)
    tail_u, tail_i = [], []
    for u in range(1, n_users):
        its = rng.choice(n_items, size=5, replace=False)
        tail_u += [u] * 5
        tail_i += its.tolist()
    users = np.concatenate([np.zeros(110, np.int32),
                            np.asarray(tail_u, np.int32)])
    items = np.concatenate([whale_items.astype(np.int32),
                            np.asarray(tail_i, np.int32)])
    ratings = rng.standard_normal(users.shape[0]).astype(np.float32)
    m = IMC(rank=4, reg=0.1, n_sweeps=2, cg_iters=15, seed=0).fit(
        (users, items, ratings), X, Y)

    uq = np.arange(6)
    sc, it = m.recommend(uq, n=8, exclude_seen=True, method="exact")
    for i, u in enumerate(uq):
        seen = set(items[users == u].tolist())
        assert not set(it[i].tolist()) & seen
    # the whale still gets correct (exact) top-k over its few unseen items
    s_ref = (X[[0]] @ m.W_) @ (Y @ m.H_).T
    s_ref[0, list(whale_items)] = -np.inf
    np.testing.assert_allclose(sc[0, 0], s_ref.max(), rtol=1e-5)

    # (b) projected-catalog cache: second call reuses the same device array
    assert m._veff_cache is not None
    cache_id = id(m._veff_cache)
    m.recommend(uq, n=4, method="exact")
    assert id(m._veff_cache) == cache_id
    # fresh-Y queries bypass (and do not clobber) the cache
    Y2 = rng.standard_normal((50, 6)).astype(np.float32)
    m.recommend(uq, n=4, Y=Y2, method="exact")
    assert id(m._veff_cache) == cache_id
    # refit invalidates
    m.fit((users, items, ratings), X, Y)
    assert m._veff_cache is None
    # identity-keyed invalidation (ADVICE r3): ANY swap of H_ (manual
    # assignment, future load APIs) must recompute — no explicit reset
    m.recommend(uq, n=4, method="exact")
    veff_old = np.asarray(m._veff_cache[2][0])
    m.H_ = np.ascontiguousarray(m.H_ * 2.0)
    sc2, _ = m.recommend(uq, n=4, method="exact")
    np.testing.assert_allclose(np.asarray(m._veff_cache[2][0]),
                               veff_old * 2.0, rtol=1e-5)
    # IN-PLACE mutation of H_ (same object identity) must also invalidate:
    # the key is H_'s content, not its id (r4 review)
    m.H_ *= 0.5
    m.recommend(uq, n=4, method="exact")
    np.testing.assert_allclose(np.asarray(m._veff_cache[2][0]), veff_old,
                               rtol=1e-5)


def test_fresh_catalog_exclusion_not_applied(imc_problem):
    """r4 review: training item ids address the TRAINING catalog — with a
    fresh Y, exclude_seen must serve unfiltered (with a warning), not drop
    arbitrary new-catalog items at the training ids' positions."""
    X, Y, users, items, r = imc_problem
    m = IMC(rank=4, reg=0.1, n_sweeps=2, cg_iters=15, seed=0).fit(
        (users, items, r), X, Y)
    rng = np.random.default_rng(9)
    Ynew = rng.standard_normal((30, Y.shape[1])).astype(np.float32)
    import warnings as w
    with w.catch_warnings(record=True) as rec:
        w.simplefilter("always")
        sc, it = m.recommend([0, 1], n=5, Y=Ynew, exclude_seen=True)
    assert any("fresh Y" in str(x.message) for x in rec)
    ref_s, ref_i = m.recommend([0, 1], n=5, Y=Ynew, exclude_seen=False)
    np.testing.assert_array_equal(it, ref_i)      # unfiltered, not mangled


def test_failed_refit_keeps_serving_state_consistent(imc_problem):
    """r4 review: a refit that fails validation must not overwrite the
    previous fit's exclusion lists."""
    import pytest
    X, Y, users, items, r = imc_problem
    m = IMC(rank=4, reg=0.1, n_sweeps=2, cg_iters=15, seed=0).fit(
        (users, items, r), X, Y)
    before = (m._train_indptr.copy(), m._train_items.copy())
    bad_users = users.copy(); bad_users[0] = 10_000
    with pytest.raises(ValueError, match="exceed feature rows"):
        m.fit((bad_users, items, r), X, Y)
    np.testing.assert_array_equal(m._train_indptr, before[0])
    np.testing.assert_array_equal(m._train_items, before[1])
    with pytest.raises(ValueError, match="non-negative"):
        m.fit((users, np.where(np.arange(items.size) == 0, -1, items), r),
              X, Y)


def test_resumed_predict_gives_guided_error(tmp_path, imc_problem):
    """r4 review: predict/rmse on a checkpoint-resumed estimator raised a
    bare AttributeError; now a guided RuntimeError like recommend()'s."""
    import pytest
    X, Y, users, items, r = imc_problem
    d = str(tmp_path / "ck")
    IMC(rank=4, reg=0.1, n_sweeps=2, cg_iters=10, seed=0,
        checkpoint_dir=d, checkpoint_every=1).fit((users, items, r), X, Y)
    m = IMC(rank=4)
    m.resume(d)
    with pytest.raises(RuntimeError, match="pass X and Y"):
        m.predict([0], [1])
    with pytest.raises(RuntimeError, match="pass X and Y"):
        m.predict_all(0)
    # explicit features work
    p = m.predict([0], [1], X=X, Y=Y)
    assert p.shape == (1,)


def test_factor_grams_row_blocking_parity():
    """r4 review: big buckets now accumulate in row blocks; results must
    be identical to the unblocked path."""
    import jax.numpy as jnp
    from recommendation_models_tpu.config import DataConfig
    from recommendation_models_tpu.data.layout import layout_from_coo
    from recommendation_models_tpu.models.imc import _factor_grams
    from recommendation_models_tpu.solver.als_sweep import device_buckets

    rng = np.random.default_rng(23)
    n_rows, n_cols, k = 600, 80, 6
    u = rng.integers(0, n_rows, 6000)
    i = rng.integers(0, n_cols, 6000)
    v = rng.uniform(1, 5, 6000).astype(np.float32)
    lay = layout_from_coo(u, i, v, n_rows, n_cols,
                          DataConfig(dense_whales=False, hot_cols=0))
    bk = device_buckets(lay)
    Z = jnp.asarray(rng.standard_normal((n_cols, k)), jnp.float32)
    G1, R1, r1 = _factor_grams(Z, bk, n_rows, gather_budget_mb=4096)
    G2, R2, r2 = _factor_grams(Z, bk, n_rows, gather_budget_mb=1)  # forces blocks
    np.testing.assert_allclose(np.asarray(G2), np.asarray(G1), rtol=1e-5,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(R2), np.asarray(R1), rtol=1e-5,
                               atol=1e-5)
    np.testing.assert_allclose(float(r2), float(r1), rtol=1e-5)
