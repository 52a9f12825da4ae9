"""Eval metrics (SURVEY.md N10): RMSE, recall@k, NDCG@k.

These back the quality-parity gates (BASELINE.json: "RMSE and recall@k on
MovieLens within run-to-run variance"; recall@10 / NDCG@10 for the retrieval
serving config).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np


def rmse(pred: np.ndarray, target: np.ndarray) -> float:
    pred = np.asarray(pred, np.float64)
    target = np.asarray(target, np.float64)
    return float(np.sqrt(np.mean((pred - target) ** 2)))


def recall_at_k(topk_items: np.ndarray, relevant: Sequence[np.ndarray]) -> float:
    """Mean over users of |topk ∩ relevant| / min(k, |relevant|).

    topk_items: (n_users, k) ranked item ids. relevant: per-user arrays of
    held-out item ids. Users with no held-out items are skipped.
    """
    topk_items = np.asarray(topk_items)
    k = topk_items.shape[1]
    scores = []
    for row, rel in zip(topk_items, relevant):
        rel = np.asarray(rel)
        if rel.size == 0:
            continue
        hits = np.isin(row, rel).sum()
        scores.append(hits / min(k, rel.size))
    return float(np.mean(scores)) if scores else 0.0


def ndcg_at_k(topk_items: np.ndarray, relevant: Sequence[np.ndarray]) -> float:
    """Binary-relevance NDCG@k averaged over users with held-out items."""
    topk_items = np.asarray(topk_items)
    k = topk_items.shape[1]
    discounts = 1.0 / np.log2(np.arange(2, k + 2))
    scores = []
    for row, rel in zip(topk_items, relevant):
        rel = np.asarray(rel)
        if rel.size == 0:
            continue
        gains = np.isin(row, rel).astype(np.float64)
        dcg = float(np.sum(gains * discounts))
        ideal = float(np.sum(discounts[: min(k, rel.size)]))
        scores.append(dcg / ideal)
    return float(np.mean(scores)) if scores else 0.0


__all__ = ["rmse", "recall_at_k", "ndcg_at_k"]
