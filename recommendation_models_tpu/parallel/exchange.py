"""All-to-all embedding-exchange plan (SURVEY.md N5).

When the opposite factor table is too large to all-gather per half-sweep,
each shard instead *requests* exactly the unique embedding rows its local
observations touch, grouped by owning shard. The request/response pattern is
two ``jax.lax.all_to_all``s with static padded shapes:

  1. all_to_all the (S, Rmax) request-id blocks -> each owner receives the
     ids it must serve,
  2. owner gathers its local rows -> (S, Rmax, k),
  3. all_to_all back -> the requester holds a compact local embedding table
     E of shape (S*Rmax, k).

Observation indices are remapped host-side once per layout (ratings are
static across sweeps) to point into E instead of the global table. Padding
request slots use the out-of-range sentinel so `take(..., mode='fill')`
serves zeros, and padded observations remap to slot 0 (their weight is 0).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import numpy as np

from recommendation_models_tpu.data.layout import ShardedLayout


@dataclasses.dataclass
class ExchangePlan:
    r_max: int                      # padded per-(requester, owner) request count
    col_shard_size: int             # rows of the opposite table per shard
    req_local: np.ndarray           # (S, S, Rmax) int32 owner-local ids;
                                    # sentinel = col_shard_size (out of range)
    remapped: Tuple[np.ndarray, ...]  # per bucket (S, B, P) int32 slots into E


def build_exchange_plan(layout: ShardedLayout, col_shard_size: int) -> ExchangePlan:
    """Precompute the exchange for one orientation's sharded layout.

    ``col_shard_size`` is the opposite table's rows_per_shard (its padded
    global size is S * col_shard_size), defining ownership:
    ``owner(col) = col // col_shard_size``.
    """
    if layout.dense_ids is not None or layout.hot_ids is not None:
        raise ValueError(
            "build_exchange_plan: dense-whale/hot-column blocks hold GLOBAL "
            "column ids and need the full opposite table — use 'allgather' "
            "exchange, or build the layout with DataConfig(dense_whales="
            "False, hot_cols=0) for all_to_all")
    S = layout.n_shards
    css = col_shard_size

    # 1. unique needed ids per (requester shard, owner shard)
    req_ids = [[None] * S for _ in range(S)]
    r_max = 1
    for s in range(S):
        parts = []
        for idx, msk in zip(layout.indices, layout.mask):
            real = msk[s] > 0
            parts.append(idx[s][real].ravel())
        ids = np.unique(np.concatenate(parts)) if parts else np.empty(0, np.int64)
        owners = ids // css
        for o in range(S):
            req_ids[s][o] = ids[owners == o]
            r_max = max(r_max, req_ids[s][o].shape[0])
    r_max = -(-r_max // 8) * 8

    # 2. padded owner-local request blocks
    req_local = np.full((S, S, r_max), css, dtype=np.int32)
    for s in range(S):
        for o in range(S):
            ids = req_ids[s][o]
            req_local[s, o, : ids.shape[0]] = (ids - o * css).astype(np.int32)

    # 3. remap observation indices -> slots into E (S*Rmax rows)
    remapped = []
    for idx, msk in zip(layout.indices, layout.mask):
        out = np.zeros_like(idx)
        for s in range(S):
            ids = idx[s]
            owners = ids // css
            slots = np.zeros(ids.shape, dtype=np.int64)
            for o in range(S):
                m = owners == o
                if not m.any():
                    continue
                pos = np.searchsorted(req_ids[s][o], ids[m])
                slots[m] = o * r_max + pos
            out[s] = np.where(msk[s] > 0, slots, 0).astype(np.int32)
        remapped.append(out)

    return ExchangePlan(r_max=int(r_max), col_shard_size=css,
                        req_local=req_local, remapped=tuple(remapped))


__all__ = ["ExchangePlan", "build_exchange_plan"]
