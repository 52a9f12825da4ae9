"""sklearn API conformance (SURVEY.md §4.1: get_params/set_params round-trip,
clone-ability, predict shapes, scoring, top-n)."""

import numpy as np
import pytest

from recommendation_models_tpu import ALS, IMC
from tests.conftest import tiny_problem


def test_get_set_params_roundtrip():
    m = ALS(rank=7, reg=0.2, alpha=1.5)
    p = m.get_params()
    assert p["rank"] == 7 and p["reg"] == 0.2 and p["alpha"] == 1.5
    m.set_params(rank=9)
    assert m.rank == 9
    with pytest.raises(ValueError):
        m.set_params(bogus=1)


def test_sklearn_clone():
    from sklearn.base import clone
    m = clone(ALS(rank=5, reg=0.7))
    assert m.rank == 5 and m.reg == 0.7
    m2 = clone(IMC(rank=3, reg=0.01))
    assert m2.rank == 3


def test_unfitted_raises():
    with pytest.raises(RuntimeError):
        ALS().predict([0], [0])
    with pytest.raises(RuntimeError):
        IMC().predict([0], [0])


def test_predict_pairs_and_separate_args():
    R = tiny_problem(20, 15, seed=20)
    m = ALS(rank=4, n_sweeps=2).fit(R)
    pairs = np.array([[0, 1], [3, 2], [19, 14]])
    a = m.predict(pairs)
    b = m.predict(pairs[:, 0], pairs[:, 1])
    np.testing.assert_allclose(a, b)
    assert a.shape == (3,)
    np.testing.assert_allclose(
        a, np.einsum("ok,ok->o", m.U_[pairs[:, 0]], m.V_[pairs[:, 1]]),
        rtol=1e-6)


def test_score_is_negative_rmse():
    R = tiny_problem(20, 15, seed=21)
    m = ALS(rank=4, n_sweeps=3).fit(R)
    assert m.score(R) == -m.rmse(R)
    assert m.score(R) <= 0


def test_recommend_excludes_seen():
    R = tiny_problem(25, 30, density=0.4, seed=22)
    m = ALS(rank=4, n_sweeps=3).fit(R)
    scores, items = m.recommend([0, 5], n=5)
    assert items.shape == (2, 5)
    seen0 = set(R.indices[R.indptr[0]:R.indptr[1]].tolist())
    assert not (set(items[0].tolist()) & seen0)
    # not excluding seen returns the raw argmax ranking
    scores2, items2 = m.recommend([0], n=5, exclude_seen=False)
    full = m.predict_all(0)
    np.testing.assert_array_equal(items2[0], np.argsort(-full)[:5])


def test_top_n_matches_recommend():
    R = tiny_problem(10, 12, seed=23)
    m = ALS(rank=3, n_sweeps=2).fit(R)
    np.testing.assert_array_equal(m.top_n(3, n=4), m.recommend([3], 4)[1][0])


def test_gridsearch_compatible():
    """Composability with the REAL sklearn GridSearchCV (SURVEY.md §2.1 row
    10: grid-search compatibility). CV splits user rows as samples; score is
    negative RMSE on the held-out rows' observed entries."""
    from sklearn.model_selection import GridSearchCV, KFold
    R = tiny_problem(30, 20, density=0.4, seed=24)
    gs = GridSearchCV(ALS(rank=4, n_sweeps=2), {"reg": [0.01, 0.1, 1.0]},
                      cv=KFold(3), error_score="raise")
    gs.fit(R)
    assert gs.best_params_["reg"] in (0.01, 0.1, 1.0)
    assert np.isfinite(gs.best_score_)
    # refit model is usable
    assert gs.best_estimator_.predict([0], [0]).shape == (1,)


def test_from_configs_roundtrip():
    from recommendation_models_tpu.config import (DataConfig, FitConfig,
                                                  MeshConfig, SolveConfig)
    m = ALS.from_configs(
        solve=SolveConfig(rank=7, reg=0.25, alpha=1.5),
        mesh=MeshConfig(n_shards=2, exchange="hybrid", exchange_head=64,
                        num_slices=2, platform="cpu"),
        data=DataConfig(max_bucket=128, layout_cache="/tmp/lc"),
        fit=FitConfig(n_sweeps=3, seed=9))
    p = m.get_params()
    assert (p["rank"], p["reg"], p["alpha"]) == (7, 0.25, 1.5)
    assert (p["n_shards"], p["exchange"]) == (2, "hybrid")
    assert (p["exchange_head"], p["num_slices"]) == (64, 2)
    assert p["layout_cache"] == "/tmp/lc"
    # layout knobs ride the full-fidelity data_config (r4: the per-field
    # mapping dropped knobs); the resolved layout honors them
    assert p["data_config"].max_bucket == 128
    assert m._data_config().max_bucket == 128
    assert (p["n_sweeps"], p["seed"]) == (3, 9)


def test_reference_name_aliases():
    """`lambda_` / `max_iter` (the reference's probable kwarg names —
    SURVEY.md §0 items 1-2, unverifiable while the mount is empty) are
    accepted as aliases of reg / n_sweeps and take precedence when set."""
    from sklearn.base import clone
    from tests.conftest import tiny_problem
    from recommendation_models_tpu import IMC
    R = tiny_problem(25, 18, seed=9)
    a = ALS(rank=4, lambda_=0.3, max_iter=3, seed=0).fit(R)
    b = ALS(rank=4, reg=0.3, n_sweeps=3, seed=0).fit(R)
    np.testing.assert_array_equal(a.U_, b.U_)
    assert len(a.history_) == 3
    # sklearn contract still holds with the aliases set
    c = clone(ALS(rank=4, lambda_=0.3, max_iter=3))
    assert (c.lambda_, c.max_iter) == (0.3, 3)
    # IMC mirrors
    import numpy as _np
    rng = _np.random.default_rng(0)
    X = rng.standard_normal((25, 6)).astype(_np.float32)
    Y = rng.standard_normal((18, 5)).astype(_np.float32)
    mi = IMC(rank=3, lambda_=0.2, max_iter=2, cg_iters=10).fit(R, X, Y)
    mj = IMC(rank=3, reg=0.2, n_sweeps=2, cg_iters=10).fit(R, X, Y)
    np.testing.assert_array_equal(mi.W_, mj.W_)
    # conflicting alias + canonical values raise LOUDLY: a grid search
    # sweeping `reg` while lambda_ is set must not be a silent no-op
    import pytest as _pytest
    with _pytest.raises(ValueError, match="only one"):
        ALS(rank=4, reg=0.7, lambda_=0.3).fit(R)
    with _pytest.raises(ValueError, match="only one"):
        ALS(rank=4, n_sweeps=5, max_iter=3).fit(R)
    # sentinel defaults (ADVICE r3): an explicitly-passed value EQUAL to
    # the documented default still conflicts — the old literal-default
    # guard silently trained ALS(reg=0.1, lambda_=0.5) with 0.5
    with _pytest.raises(ValueError, match="only one"):
        ALS(rank=4, reg=0.1, lambda_=0.5).fit(R)
    with _pytest.raises(ValueError, match="only one"):
        ALS(rank=4, n_sweeps=10, max_iter=3).fit(R)
    with _pytest.raises(ValueError, match="only one"):
        IMC(rank=3, reg=0.1, lambda_=0.5).fit(R, X, Y)
    # equal values are not a conflict (explicitly redundant is fine)
    assert ALS(rank=4, reg=0.3, lambda_=0.3)._reg == 0.3


def test_pickle_fitted_roundtrip():
    import pickle
    from tests.conftest import tiny_problem
    R = tiny_problem(20, 15, seed=5)
    m = ALS(rank=4, n_sweeps=2, seed=0).fit(R)
    m2 = pickle.loads(pickle.dumps(m))
    np.testing.assert_array_equal(m2.U_, m.U_)
    np.testing.assert_array_equal(m2.predict([[0, 1]]), m.predict([[0, 1]]))
    # sharded fit holds a compiled program -> must still pickle
    ms = ALS(rank=4, n_sweeps=2, n_shards=4, platform="cpu", seed=0).fit(R)
    ms2 = pickle.loads(pickle.dumps(ms))
    np.testing.assert_array_equal(ms2.V_, ms.V_)


def test_layout_cache_used_by_fit(tmp_path):
    from tests.conftest import tiny_problem
    R = tiny_problem(25, 18, seed=6)
    prefix = str(tmp_path / "ml")
    m1 = ALS(rank=3, n_sweeps=2, seed=0, layout_cache=prefix).fit(R)
    import glob
    # the cache tag encodes layout-changing flavors (nodense / hot width)
    assert glob.glob(prefix + "*.user.npz")
    assert glob.glob(prefix + "*.item.npz")
    # second fit loads from cache, same result
    m2 = ALS(rank=3, n_sweeps=2, seed=0, layout_cache=prefix).fit(R)
    np.testing.assert_allclose(m1.U_, m2.U_, rtol=1e-6)


def test_layout_cache_invalidated_on_different_data(tmp_path):
    """Refitting the SAME cache prefix on DIFFERENT data must not reuse the
    stale layout (round-1 gap: the tag now includes a data fingerprint)."""
    import glob
    from tests.conftest import tiny_problem
    prefix = str(tmp_path / "ml")
    R1 = tiny_problem(25, 18, seed=6)
    ALS(rank=3, n_sweeps=2, seed=0, layout_cache=prefix).fit(R1)
    n_before = len(glob.glob(prefix + "*.npz"))
    R2 = tiny_problem(25, 18, seed=7)           # same shape, different data
    m2 = ALS(rank=3, n_sweeps=2, seed=0, layout_cache=prefix).fit(R2)
    assert len(glob.glob(prefix + "*.npz")) == 2 * n_before  # new tag files
    # the refit model must reflect R2, not R1's cached layout
    ref = ALS(rank=3, n_sweeps=2, seed=0).fit(R2)
    np.testing.assert_allclose(m2.U_, ref.U_, rtol=1e-5, atol=1e-6)


def test_dense_min_degree_auto_policy():
    """The dense-whale threshold is rank-aware (break-even scales ~rank^2;
    measured 512 @ k=64 vs 2048 @ k=128 on v5e — config.py)."""
    from recommendation_models_tpu.config import dense_min_degree_for_rank
    assert dense_min_degree_for_rank(64) == 512
    assert dense_min_degree_for_rank(128) == 2048
    assert dense_min_degree_for_rank(10) == 512          # clamped low
    assert dense_min_degree_for_rank(256, 4096) == 4096  # clamped high
    assert ALS(rank=128)._data_config().dense_min_degree == 2048
    assert ALS(rank=128, dense_min_degree=700)._data_config(
        ).dense_min_degree == 700
    # from_configs: the dataclass default (None = auto) resolves per rank;
    # an EXPLICIT 512 at rank 128 is honored literally (r4 review)
    from recommendation_models_tpu.config import DataConfig, SolveConfig
    m = ALS.from_configs(solve=SolveConfig(rank=128), data=DataConfig())
    assert m._data_config().dense_min_degree == 2048
    m2 = ALS.from_configs(solve=SolveConfig(rank=128),
                          data=DataConfig(dense_min_degree=512))
    assert m2._data_config().dense_min_degree == 512
    # dense_whales / merge-slack knobs survive the config layer now
    m3 = ALS.from_configs(data=DataConfig(dense_whales=False,
                                          bucket_merge_slack=7))
    assert m3._data_config().dense_whales is False
    assert m3._data_config().bucket_merge_slack == 7
    m = ALS.from_configs(solve=SolveConfig(rank=128),
                         data=DataConfig(dense_min_degree=777))
    assert m._data_config().dense_min_degree == 777


def test_fold_in_matches_oracle_half_sweep():
    """fold_in solves new rows against the FIXED opposite table — per-row
    it must equal the oracle's ridge solve (both objectives, both sides)."""
    import scipy.sparse as sp
    from tests.conftest import tiny_problem
    from recommendation_models_tpu.oracle.als_numpy import OracleALS

    R = tiny_problem(40, 30, density=0.4, seed=51)
    rng = np.random.default_rng(4)
    for alpha in (None, 3.0):
        m = ALS(rank=5, reg=0.3, alpha=alpha, n_sweeps=3, seed=0).fit(R)
        # new users rating the trained item space
        mask = rng.random((6, 30)) < 0.5
        Rn = sp.csr_matrix(np.where(mask, rng.integers(1, 11, mask.shape)
                                    / 2.0, 0.0))
        x = m.fold_in(Rn, side="user")
        o = OracleALS(rank=5, reg=0.3, alpha=alpha)
        ref = o.half_sweep(Rn, np.asarray(m.V_, np.float64))
        np.testing.assert_allclose(x, ref, rtol=2e-4, atol=2e-5)
        # new items rated by the trained user space
        Rni = sp.csr_matrix(np.where(rng.random((40, 4)) < 0.5,
                                     rng.integers(1, 11, (40, 4)) / 2.0,
                                     0.0))
        y = m.fold_in(Rni, side="item")
        ref_i = o.half_sweep(sp.csr_matrix(Rni.T),
                             np.asarray(m.U_, np.float64))
        np.testing.assert_allclose(y, ref_i, rtol=2e-4, atol=2e-5)
    # dimension mismatch is loud
    import pytest as _pytest
    with _pytest.raises(ValueError, match="item space"):
        m.fold_in(sp.csr_matrix(np.ones((3, 7))), side="user")


def test_warm_start_requires_both_factors():
    """r4 review: fit(R, U0=...) alone was silently ignored."""
    R = tiny_problem(20, 15, seed=30)
    U0 = np.zeros((20, 4), np.float32)
    with pytest.raises(ValueError, match="BOTH"):
        ALS(rank=4, n_sweeps=1).fit(R, U0=U0)


def test_recommend_validates_user_ids():
    """r4 review: the sharded serving path gathered out-of-range ids with
    fill-mode jnp.take (silent NaN/padding rows); validation is uniform."""
    R = tiny_problem(20, 15, seed=31)
    m = ALS(rank=4, n_sweeps=2).fit(R)
    with pytest.raises(ValueError, match="user ids"):
        m.recommend([25], n=3)
    with pytest.raises(ValueError, match="user ids"):
        m.recommend([-1], n=3)
    ms = ALS(rank=4, n_sweeps=2, n_shards=4, platform="cpu").fit(R)
    with pytest.raises(ValueError, match="user ids"):
        ms.recommend([20], n=3)   # within the PADDED table, beyond n_users_


def test_single_device_refit_clears_sharded_state():
    """r4 review: a prior sharded fit's program pinned nnz-scale device
    buckets in HBM (and stale traffic accounting) across single-device
    refits."""
    R = tiny_problem(24, 18, seed=32)
    m = ALS(rank=4, n_sweeps=2, n_shards=4, platform="cpu").fit(R)
    assert m._sharded_program is not None
    assert hasattr(m, "exchange_bytes_per_sweep_")
    m.set_params(n_shards=None)
    m.fit(R)
    assert m._sharded_program is None
    assert not hasattr(m, "exchange_bytes_per_sweep_")


def test_resume_clears_previous_fit_serving_state(tmp_path):
    """r4 review: resume() after an unrelated fit kept the OLD training
    indices — exclude_seen silently used them against the new factors."""
    import warnings as w
    R1 = tiny_problem(20, 15, seed=33)
    d = str(tmp_path / "ck")
    ALS(rank=4, n_sweeps=2, checkpoint_dir=d, checkpoint_every=1).fit(R1)
    m = ALS(rank=4, n_sweeps=2).fit(tiny_problem(12, 10, seed=34))
    m.resume(d)
    assert not hasattr(m, "_train_indptr")
    with w.catch_warnings(record=True) as rec:
        w.simplefilter("always")
        m.recommend([0], n=3, exclude_seen=True)
    assert any("canNOT be excluded" in str(x.message) for x in rec)
