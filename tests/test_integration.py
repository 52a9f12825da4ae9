"""End-to-end integration (SURVEY.md §4.2-5): ML-100K-shaped fit -> RMSE
parity bound; recall@10 / NDCG@10 harness on a fixed leave-n-out split
(BASELINE.md quality gates).

Runs on CPU with a synthetic low-rank + noise ratings matrix (the real
MovieLens archives are not downloadable here — SURVEY.md §0); the quality
gates are therefore *relative*: test RMSE must beat the constant predictor
by a wide margin, and retrieval must beat random by an order of magnitude.
"""

import numpy as np
import pytest
import scipy.sparse as sp

from recommendation_models_tpu import ALS
from recommendation_models_tpu.data.synthetic import synthetic_ratings
from recommendation_models_tpu.evaluate import (leave_n_out, ndcg_at_k,
                                                recall_at_k)
from recommendation_models_tpu.evaluate.protocol import relevant_by_user

N_USERS, N_ITEMS = 943, 1_682


@pytest.fixture(scope="module")
def ml100k_split():
    users, items, ratings = synthetic_ratings(
        N_USERS, N_ITEMS, 100_000, rank=8, noise=0.3, seed=11)
    tr, te = leave_n_out(users, items, ratings, n=3, seed=1)
    train = sp.csr_matrix((ratings[tr], (users[tr], items[tr])),
                          shape=(N_USERS, N_ITEMS))
    test = sp.csr_matrix((ratings[te], (users[te], items[te])),
                         shape=(N_USERS, N_ITEMS))
    return train, test, (users[te], items[te], ratings[te])


def test_explicit_fit_beats_constant_predictor(ml100k_split):
    train, test, (tu, ti, tr) = ml100k_split
    # standard usage: mean-center (this ALS is bias-free, like the
    # reference), moderate reg for a 63-ratings-per-user regime
    mu = train.data.mean()
    centered = train.copy()
    centered.data = centered.data - mu
    m = ALS(rank=8, reg=1.0, n_sweeps=12, seed=0).fit(centered)
    pred = m.predict(tu, ti) + mu
    model_rmse = float(np.sqrt(np.mean((tr - pred) ** 2)))
    const_rmse = float(np.sqrt(np.mean((tr - mu) ** 2)))
    assert model_rmse < 0.8 * const_rmse, (model_rmse, const_rmse)
    # train history must have converged
    assert m.history_[-1] < m.history_[0]


def test_implicit_retrieval_beats_random(ml100k_split):
    train, test, (tu, ti, tr) = ml100k_split
    m = ALS(rank=16, alpha=2.0, reg=0.05, n_sweeps=10, seed=0).fit(train)
    rel = relevant_by_user(tu, ti, N_USERS)
    eval_users = np.flatnonzero([len(r) > 0 for r in rel])
    _, topk = m.recommend(eval_users, n=10, exclude_seen=True)
    rel_eval = [rel[u] for u in eval_users]
    recall = recall_at_k(topk, rel_eval)
    ndcg = ndcg_at_k(topk, rel_eval)
    random_recall = 10 / N_ITEMS
    assert recall > 10 * random_recall, (recall, random_recall)
    assert ndcg > 0.01, ndcg
