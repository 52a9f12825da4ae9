"""Eval metrics + split protocol tests (SURVEY.md N10)."""

import numpy as np

from recommendation_models_tpu.evaluate.metrics import ndcg_at_k, recall_at_k, rmse
from recommendation_models_tpu.evaluate.protocol import leave_n_out, relevant_by_user


def test_rmse():
    assert rmse([1.0, 2.0], [1.0, 2.0]) == 0.0
    assert abs(rmse([0.0, 0.0], [3.0, 4.0]) - np.sqrt(12.5)) < 1e-9


def test_recall_at_k():
    topk = np.array([[1, 2, 3], [4, 5, 6]])
    rel = [np.array([2]), np.array([7, 8])]
    # user0: 1/1 hit; user1: 0/2
    assert recall_at_k(topk, rel) == 0.5
    # user with empty relevant skipped
    assert recall_at_k(topk, [np.array([1]), np.array([])]) == 1.0


def test_ndcg_perfect_and_zero():
    topk = np.array([[5, 6, 7]])
    assert ndcg_at_k(topk, [np.array([5, 6, 7])]) == 1.0
    assert ndcg_at_k(topk, [np.array([9])]) == 0.0
    # hit at rank 2 only, one relevant: dcg=1/log2(3), idcg=1
    v = ndcg_at_k(np.array([[1, 5, 2]]), [np.array([5])])
    assert abs(v - 1.0 / np.log2(3)) < 1e-9


def test_leave_n_out():
    users = np.array([0, 0, 0, 1, 1, 2])
    items = np.array([0, 1, 2, 0, 1, 0])
    r = np.ones(6, np.float32)
    train, test = leave_n_out(users, items, r, n=1, seed=0)
    assert train.sum() + test.sum() == 6
    # each user keeps at least one train interaction
    for u in range(3):
        assert (users[train] == u).sum() >= 1
    # user 2 has a single interaction: never held out
    assert not test[5]
    rel = relevant_by_user(users[test], items[test], 3)
    assert len(rel) == 3


def test_leave_n_out_deterministic():
    users = np.repeat(np.arange(10), 5)
    items = np.tile(np.arange(5), 10)
    r = np.ones(50, np.float32)
    a = leave_n_out(users, items, r, n=2, seed=3)
    b = leave_n_out(users, items, r, n=2, seed=3)
    np.testing.assert_array_equal(a[0], b[0])


def _naive_recall(topk, rel):
    scores = []
    for row, r in zip(topk, rel):
        r = np.asarray(r)
        if r.size == 0:
            continue
        scores.append(np.isin(row, r).sum() / min(len(row), r.size))
    return float(np.mean(scores)) if scores else 0.0


def _naive_ndcg(topk, rel):
    k = topk.shape[1]
    disc = 1.0 / np.log2(np.arange(2, k + 2))
    scores = []
    for row, r in zip(topk, rel):
        r = np.asarray(r)
        if r.size == 0:
            continue
        gains = np.isin(row, r).astype(np.float64)
        scores.append(np.sum(gains * disc) / np.sum(disc[: min(k, r.size)]))
    return float(np.mean(scores)) if scores else 0.0


def test_vectorized_metrics_match_naive_loop():
    rng = np.random.default_rng(7)
    B, k, n_items = 200, 10, 500
    topk = np.stack([rng.choice(n_items, k, replace=False) for _ in range(B)])
    rel = [rng.choice(n_items, rng.integers(0, 6), replace=False)
           for _ in range(B)]
    assert abs(recall_at_k(topk, rel) - _naive_recall(topk, rel)) < 1e-12
    assert abs(ndcg_at_k(topk, rel) - _naive_ndcg(topk, rel)) < 1e-12


def test_metrics_accept_csr_grouping():
    from recommendation_models_tpu.evaluate.metrics import take_groups
    from recommendation_models_tpu.evaluate.protocol import grouped_by_user
    rng = np.random.default_rng(3)
    n_users, n_items = 50, 80
    tu = rng.integers(0, n_users, 300)
    ti = rng.integers(0, n_items, 300)
    indptr, items = grouped_by_user(tu, ti, n_users)
    rel_list = relevant_by_user(tu, ti, n_users)
    eval_users = np.flatnonzero(np.diff(indptr) > 0)
    topk = np.stack([rng.choice(n_items, 10, replace=False)
                     for _ in eval_users])
    csr_form = take_groups(indptr, items, eval_users)
    list_form = [rel_list[u] for u in eval_users]
    assert recall_at_k(topk, csr_form) == recall_at_k(topk, list_form)
    assert ndcg_at_k(topk, csr_form) == ndcg_at_k(topk, list_form)


def test_take_groups_matches_slices():
    from recommendation_models_tpu.evaluate.metrics import take_groups
    from recommendation_models_tpu.evaluate.protocol import grouped_by_user
    rng = np.random.default_rng(5)
    tu = rng.integers(0, 20, 100)
    ti = rng.integers(0, 40, 100)
    indptr, items = grouped_by_user(tu, ti, 20)
    rows = np.array([3, 0, 17, 17, 5])
    sub_ptr, sub_items = take_groups(indptr, items, rows)
    for j, u in enumerate(rows):
        np.testing.assert_array_equal(
            sub_items[sub_ptr[j]:sub_ptr[j + 1]],
            items[indptr[u]:indptr[u + 1]])


def test_leave_n_out_scale_is_fast():
    # config-5 gate: host eval prep must be seconds at ML-25M scale; this
    # pins the protocol path as vectorized (2M obs in well under 10 s even
    # on a slow CI host — the old per-obs loop took minutes).
    import time
    rng = np.random.default_rng(0)
    n_obs, n_users = 2_000_000, 100_000
    users = rng.integers(0, n_users, n_obs)
    items = rng.integers(0, 10_000, n_obs)
    r = np.ones(n_obs, np.float32)
    t0 = time.perf_counter()
    train, test = leave_n_out(users, items, r, n=2, seed=0)
    from recommendation_models_tpu.evaluate.protocol import grouped_by_user
    indptr, _ = grouped_by_user(users[test], items[test], n_users)
    elapsed = time.perf_counter() - t0
    assert elapsed < 10.0
    # invariants: per-user holdout <= 2 and never the whole user
    held = np.bincount(users[test], minlength=n_users)
    total = np.bincount(users, minlength=n_users)
    assert held.max() <= 2
    assert ((total - held) >= 1)[total > 0].all()
    np.testing.assert_array_equal(held, np.diff(indptr))
