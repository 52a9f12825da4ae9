"""Dataset-scale quality parity vs the FULL reference-faithful oracle
(BASELINE.json:5): fit OracleALS completely on the ML-100K-shape problem
over 3 seeds (explicit + implicit), fit the TPU estimator with the same
inits, and print both sides' RMSE / recall@10 / NDCG@10 for BASELINE.md's
quality-parity row. Run with the TPU attached to exercise the production
path (Pallas solver + bf16 matmul inputs); the pytest version of this
protocol lives in tests/test_integration.py.
"""

import json
import os
import sys
import time

import numpy as np
import scipy.sparse as sp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from recommendation_models_tpu import ALS
from recommendation_models_tpu.data.synthetic import synthetic_ratings
from recommendation_models_tpu.evaluate import (leave_n_out, ndcg_at_k,
                                                recall_at_k)
from recommendation_models_tpu.evaluate.protocol import relevant_by_user
from recommendation_models_tpu.oracle.als_numpy import OracleALS

N_USERS, N_ITEMS = 943, 1_682


def main():
    import jax
    print(f"# device: {jax.devices()[0].device_kind}", file=sys.stderr)
    users, items, ratings = synthetic_ratings(
        N_USERS, N_ITEMS, 100_000, rank=8, noise=0.3, seed=11)
    tr, te = leave_n_out(users, items, ratings, n=3, seed=1)
    train = sp.csr_matrix((ratings[tr], (users[tr], items[tr])),
                          shape=(N_USERS, N_ITEMS))
    tu, ti, trr = users[te], items[te], ratings[te]
    mu = train.data.mean()
    cen = train.copy()
    cen.data = cen.data - mu

    def test_rmse(U, V):
        pred = np.einsum("ok,ok->o", np.asarray(U)[tu],
                         np.asarray(V)[ti]) + mu
        return float(np.sqrt(np.mean((trr - pred) ** 2)))

    out = {"explicit_rmse": {"oracle": [], "tpu": []},
           "recall_at_10": {"oracle": [], "tpu": []},
           "ndcg_at_10": {"oracle": [], "tpu": []}}
    t0 = time.time()
    for seed in (0, 1, 2):
        o = OracleALS(rank=10, reg=0.5, n_sweeps=6, seed=seed)
        U0, V0 = o.init_factors(N_USERS, N_ITEMS)
        o.fit(cen, U0=U0, V0=V0)
        m = ALS(rank=10, reg=0.5, n_sweeps=6).fit(cen, U0=U0, V0=V0)
        out["explicit_rmse"]["oracle"].append(round(test_rmse(o.U_, o.V_), 5))
        out["explicit_rmse"]["tpu"].append(round(test_rmse(m.U_, m.V_), 5))
        print(f"# explicit seed {seed} done {time.time()-t0:.0f}s",
              file=sys.stderr)

    rel = relevant_by_user(tu, ti, N_USERS)
    eval_users = np.flatnonzero([len(r) > 0 for r in rel])
    rel_eval = [rel[u] for u in eval_users]
    for seed in (0, 1, 2):
        o = OracleALS(rank=16, reg=0.05, alpha=2.0, n_sweeps=6, seed=seed)
        U0, V0 = o.init_factors(N_USERS, N_ITEMS)
        o.fit(train, U0=U0, V0=V0)
        topk_o = np.stack([o.top_n(u, 10, exclude=train[u].indices)
                           for u in eval_users])
        m = ALS(rank=16, reg=0.05, alpha=2.0, n_sweeps=6).fit(
            train, U0=U0, V0=V0)
        _, topk_t = m.recommend(eval_users, n=10, exclude_seen=True)
        out["recall_at_10"]["oracle"].append(
            round(float(recall_at_k(topk_o, rel_eval)), 4))
        out["recall_at_10"]["tpu"].append(
            round(float(recall_at_k(topk_t, rel_eval)), 4))
        out["ndcg_at_10"]["oracle"].append(
            round(float(ndcg_at_k(topk_o, rel_eval)), 4))
        out["ndcg_at_10"]["tpu"].append(
            round(float(ndcg_at_k(topk_t, rel_eval)), 4))
        print(f"# implicit seed {seed} done {time.time()-t0:.0f}s",
              file=sys.stderr)
    out["device"] = jax.devices()[0].device_kind
    print(json.dumps(out))


if __name__ == "__main__":
    main()
