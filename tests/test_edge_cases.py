"""Input-validation and boundary-condition probes (verify-skill checklist)."""

import numpy as np
import pytest
import scipy.sparse as sp

from recommendation_models_tpu.models.als import ALS
from recommendation_models_tpu.models.imc import IMC


def _tiny_R(n_users=30, n_items=20, seed=0):
    rng = np.random.default_rng(seed)
    u = rng.integers(0, n_users, 300)
    i = rng.integers(0, n_items, 300)
    key = np.unique(u * n_items + i)
    u, i = key // n_items, key % n_items
    r = rng.uniform(1, 5, key.size).astype(np.float32)
    return sp.csr_matrix((r, (u, i)), shape=(n_users, n_items))


def test_bad_hyperparams_raise():
    R = _tiny_R()
    with pytest.raises(ValueError):
        ALS(rank=0).fit(R)
    with pytest.raises(ValueError):
        ALS(rank=4, reg=-1.0).fit(R)
    with pytest.raises(ValueError):
        ALS(rank=4, n_sweeps=0).fit(R)


def test_recommend_n_larger_than_catalog():
    R = _tiny_R()
    m = ALS(rank=4, n_sweeps=2, seed=0, platform="cpu").fit(R)
    scores, items = m.recommend([0, 1], n=500, exclude_seen=False)
    # clamped to the catalog; every id valid and unique per user
    assert items.shape[1] <= 20
    for row in items:
        assert len(set(row.tolist())) == row.shape[0]
        assert (row >= 0).all() and (row < 20).all()


def test_dense_ndarray_input_and_3d_rejected():
    R = _tiny_R().toarray()
    m = ALS(rank=4, n_sweeps=2, seed=0, platform="cpu").fit(R)
    assert np.isfinite(m.U_).all()
    with pytest.raises(Exception):
        ALS(rank=4, n_sweeps=1).fit(np.zeros((3, 4, 5), np.float32))


def test_imc_mismatched_feature_rows_raise():
    R = _tiny_R()
    X = np.random.default_rng(0).standard_normal((29, 6)).astype(np.float32)
    Y = np.random.default_rng(1).standard_normal((20, 5)).astype(np.float32)
    with pytest.raises(Exception):
        IMC(rank=3, n_sweeps=1, platform="cpu").fit(R, X, Y)


def test_set_params_unknown_key_raises():
    with pytest.raises(Exception):
        ALS().set_params(not_a_param=3)


def test_empty_rows_and_cols_solve_to_zero():
    # user 0 and item 0 have no observations at all
    u = np.array([1, 2, 3, 4], np.int64)
    i = np.array([1, 2, 3, 1], np.int64)
    r = np.array([3.0, 4.0, 2.0, 5.0], np.float32)
    R = sp.csr_matrix((r, (u, i)), shape=(6, 5))
    m = ALS(rank=3, n_sweeps=3, seed=0, platform="cpu").fit(R)
    np.testing.assert_array_equal(m.U_[0], 0.0)
    np.testing.assert_array_equal(m.V_[0], 0.0)
    np.testing.assert_array_equal(m.U_[5], 0.0)
    np.testing.assert_array_equal(m.V_[4], 0.0)


def test_reg_zero_solves_empty_rows_to_zero():
    """r4 review: at reg=0, zero-degree rows (padding sentinels AND truly
    empty rows) had G=0 — chol(0) NaN'd. Their rhs is zero, so the ridge
    floor solves them to exactly 0 and the fit stays finite."""
    import scipy.sparse as sp
    from recommendation_models_tpu.models.als import ALS

    # rows 1, 3, 4 empty; every ITEM has degree 2 >= rank (degree < rank
    # at reg=0 is a legitimately singular system — scipy raises there too)
    R = np.zeros((5, 4), np.float32)
    R[0] = [3.0, 1.0, 2.0, 4.0]
    R[2] = [2.0, 4.0, 1.0, 3.0]
    m = ALS(rank=2, reg=0.0, n_sweeps=2).fit(sp.csr_matrix(R))
    assert np.isfinite(m.U_).all() and np.isfinite(m.V_).all()
    np.testing.assert_array_equal(m.U_[[1, 3, 4]], 0.0)
    # reg=0 fully observed also finite
    full = np.abs(np.random.default_rng(0).standard_normal((6, 5))) + 1.0
    m2 = ALS(rank=2, reg=0.0, n_sweeps=2).fit(
        sp.csr_matrix(full.astype(np.float32)))
    assert np.isfinite(m2.U_).all()
