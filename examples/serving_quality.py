"""Top-k serving with measured quality: exclusion, recall@k, and the
approx/exact speed-quality dial.

The serving path (SURVEY.md N9) is `recommend()`: a fused scoring matmul
plus TPU-native `approx_max_k` retrieval over a PERMUTED catalog — the
permutation restores approx_max_k's recall guarantee on popularity-ordered
catalogs (docs/PERF.md 'Round 5 ledger': without it, realized recall
silently drops ~11% relative on MovieLens-shaped data). This example
shows the contract you should hold your own deployment to: the served
recall@k must match an exact selector's on the same factors.

Runs anywhere; on TPU `method='auto'` picks approx for large catalogs.
"""

import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import scipy.sparse as sp

from recommendation_models_tpu import ALS
from recommendation_models_tpu.data.synthetic import synthetic_ratings
from recommendation_models_tpu.evaluate import (
    grouped_by_user, leave_n_out, ndcg_at_k, recall_at_k, take_groups)

# ML-100K-shaped synthetic interactions; leave-2-out split per user
n_users, n_items = 943, 1_682
users, items, ratings = synthetic_ratings(n_users, n_items, 100_000,
                                          rank=16, seed=0)
tr, te = leave_n_out(users, items, ratings, n=2, seed=0)
R_train = sp.csr_matrix((ratings[tr], (users[tr], items[tr])),
                        shape=(n_users, n_items))

model = ALS(rank=32, alpha=1.0, reg=0.1, n_sweeps=6, seed=0).fit(R_train)

k = 10
rel_indptr, rel_items = grouped_by_user(users[te], items[te], n_users)
eval_users = np.flatnonzero(np.diff(rel_indptr) > 0)
relevant = take_groups(rel_indptr, rel_items, eval_users)

# served top-k (exclude_seen drops each user's training items by
# overfetch-and-filter — never a scatter into materialized scores)
_, topk_served = model.recommend(eval_users, n=k, exclude_seen=True)
# the exact-selection reference on the SAME factors: served quality must
# match this (tests/test_serving_quality.py pins it at 2e-3)
_, topk_exact = model.recommend(eval_users, n=k, exclude_seen=True,
                                method="exact")

r_served = recall_at_k(topk_served, relevant)
r_exact = recall_at_k(topk_exact, relevant)
print(f"recall@{k}: served={r_served:.4f} exact={r_exact:.4f} "
      f"(delta {abs(r_served - r_exact):.4f})")
print(f"ndcg@{k}:   served={ndcg_at_k(topk_served, relevant):.4f}")
assert abs(r_served - r_exact) <= 5e-3, "served quality must track exact"

# the speed dial: recall_target trades approx_max_k reduction effort for
# throughput. On the ml25m bench workload 0.95 measures IDENTICAL
# end-to-end quality to exact at ~2x the QPS of 0.99 (BASELINE.md r5).
_, topk_fast = model.recommend(eval_users, n=k, exclude_seen=True,
                               method="approx", recall_target=0.95)
print(f"recall@{k} at recall_target=0.95: "
      f"{recall_at_k(topk_fast, relevant):.4f}")

# single-user convenience mirrors the reference's top_n
print("top-5 for user 0:", model.top_n(0, n=5))
