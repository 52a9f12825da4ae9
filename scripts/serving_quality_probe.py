"""Standalone serving-quality probe (r5: bisected the r3->r4 recall delta;
now the tool for seed bands and round-over-round serving verification).

Reproduces bench.py serving_bench's pipeline exactly (same config; SEED
varies the FIT init while the data/split stay fixed like the bench),
prints one JSON line with factor hashes + recall/ndcg via (a) the
checkout's own model.recommend and (b) a frozen exact NumPy serving path
(full f64 scores, exclude seen, exact top-k) that is independent of any
checkout's topk code. The two must agree (tests/test_serving_quality.py
pins this at small scale); raw r5 runs live in docs/measurements/r5/.

Env: SCALE (ml1m), RANK (64), SWEEPS (8), SEED (0), NPZ_OUT (optional path
to dump factors), NPZ_IN (optional: skip the fit, load factors).
"""
import hashlib
import json
import os
import sys

import numpy as np
import scipy.sparse as sp

sys.path.insert(0, os.getcwd())

from recommendation_models_tpu.data.synthetic import synthetic_ratings
from recommendation_models_tpu.evaluate import (
    grouped_by_user, leave_n_out, ndcg_at_k, recall_at_k, take_groups)
from recommendation_models_tpu.models.als import ALS

SCALES = {
    "ml25m": (162_541, 62_423, 25_000_000),
    "ml1m": (6_040, 3_706, 1_000_000),
    "ml100k": (943, 1_682, 100_000),
}


def frozen_numpy_recommend(U, V, eval_users, train_csr, k):
    """Exact reference serving: full f64 scores, exclude seen, top-k."""
    out = np.empty((eval_users.shape[0], k), np.int64)
    indptr, indices = train_csr.indptr, train_csr.indices
    B = 2048
    for s in range(0, eval_users.shape[0], B):
        us = eval_users[s:s + B]
        sc = U[us].astype(np.float64) @ V.astype(np.float64).T
        for j, u in enumerate(us):
            seen = indices[indptr[u]:indptr[u + 1]]
            sc[j, seen] = -np.inf
        part = np.argpartition(-sc, k, axis=1)[:, :k]
        rows = np.arange(us.shape[0])[:, None]
        order = np.argsort(-sc[rows, part], axis=1)
        out[s:s + B] = part[rows, order]
    return out


def main():
    scale = os.environ.get("SCALE", "ml1m")
    rank = int(os.environ.get("RANK", "64"))
    sweeps = int(os.environ.get("SWEEPS", "8"))
    seed = int(os.environ.get("SEED", "0"))
    n_users, n_items, n_obs = SCALES[scale]

    users, items, ratings = synthetic_ratings(
        n_users, n_items, n_obs, rank=16, seed=0)
    tr, te = leave_n_out(users, items, ratings, n=2, seed=0)
    train = sp.csr_matrix((ratings[tr], (users[tr], items[tr])),
                          shape=(n_users, n_items))
    k = 10
    rel_indptr, rel_items = grouped_by_user(users[te], items[te], n_users)
    eval_users = np.flatnonzero(np.diff(rel_indptr) > 0)[:20_000]
    rel_eval = take_groups(rel_indptr, rel_items, eval_users)

    npz_in = os.environ.get("NPZ_IN")
    if npz_in:
        d = np.load(npz_in)
        U, V = d["U"], d["V"]
        model = ALS(rank=rank, alpha=1.0, reg=0.1, n_sweeps=sweeps,
                    seed=seed)
        model.n_users_, model.n_items_ = n_users, n_items
        model._U_host, model._V_host = U, V
        model._U_dev = model._V_dev = None
        model._train_indptr = train.indptr.copy()
        model._train_indices = train.indices.copy()
        fit_note = "loaded"
    else:
        model = ALS(rank=rank, alpha=1.0, reg=0.1, n_sweeps=sweeps,
                    seed=seed).fit(train)
        U, V = np.asarray(model.U_), np.asarray(model.V_)
        fit_note = "fit"

    npz_out = os.environ.get("NPZ_OUT")
    if npz_out:
        np.savez(npz_out, U=U, V=V)

    uh = hashlib.sha256(np.ascontiguousarray(U, np.float32).tobytes()
                        ).hexdigest()[:16]
    vh = hashlib.sha256(np.ascontiguousarray(V, np.float32).tobytes()
                        ).hexdigest()[:16]

    _, topk = model.recommend(eval_users, n=k, exclude_seen=True)
    r_model = float(recall_at_k(topk, rel_eval))
    n_model = float(ndcg_at_k(topk, rel_eval))

    topk_frozen = frozen_numpy_recommend(U, V, eval_users, train, k)
    r_frozen = float(recall_at_k(topk_frozen, rel_eval))
    n_frozen = float(ndcg_at_k(topk_frozen, rel_eval))

    import jax
    print(json.dumps({
        "scale": scale, "rank": rank, "sweeps": sweeps, "seed": seed,
        "fit": fit_note, "U_hash": uh, "V_hash": vh,
        "recall_model_path": round(r_model, 5),
        "ndcg_model_path": round(n_model, 5),
        "recall_frozen_path": round(r_frozen, 5),
        "ndcg_frozen_path": round(n_frozen, 5),
        "platform": jax.devices()[0].platform,
    }))


if __name__ == "__main__":
    main()
