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
