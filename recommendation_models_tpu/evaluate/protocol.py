"""Train/eval split protocols (SURVEY.md N10: leave-n-out)."""

from __future__ import annotations

from typing import Tuple

import numpy as np


def leave_n_out(
    users: np.ndarray,
    items: np.ndarray,
    ratings: np.ndarray,
    n: int = 1,
    seed: int = 0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Hold out up to ``n`` random interactions per user.

    Returns (train_mask, test_mask) boolean arrays over the observation
    list. Users with fewer than ``n + 1`` interactions keep everything in
    train (never strand a user with zero training data).
    """
    users = np.asarray(users)
    n_obs = users.shape[0]
    rng = np.random.default_rng(seed)
    perm = rng.permutation(n_obs)

    test_mask = np.zeros(n_obs, dtype=bool)
    counts = np.bincount(users)
    taken = np.zeros(counts.shape[0], dtype=np.int64)
    for o in perm:
        u = users[o]
        if counts[u] - taken[u] > 1 and taken[u] < n:
            test_mask[o] = True
            taken[u] += 1
    return ~test_mask, test_mask


def relevant_by_user(users: np.ndarray, items: np.ndarray, n_users: int):
    """Group held-out item ids per user (for recall/NDCG)."""
    rel = [[] for _ in range(n_users)]
    for u, i in zip(users, items):
        rel[u].append(i)
    return [np.asarray(r, dtype=np.int64) for r in rel]


__all__ = ["leave_n_out", "relevant_by_user"]
