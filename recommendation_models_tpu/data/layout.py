"""CSR ratings -> TPU-friendly padded segment-gather layout (SURVEY.md N1).

The reference stores ratings as a `scipy.sparse` CSR matrix and slices one
ragged row per Python-loop iteration (SURVEY.md §2.1 row 1, §3.1). TPUs want
static shapes, so we re-lay CSR out as *degree-bucketed padded blocks*
(ELL-style): rows are grouped by padded degree (powers of two), each bucket is
a dense ``(B, P)`` block of column indices / values / mask. Every bucket is a
single static-shape vmapped solve; padding rows/slots carry mask 0 and
contribute exactly zero (tested).

Degree skew is the "long-context" analog here (SURVEY.md §5): bucketing keeps
padding waste bounded, and whale rows are handled downstream by *chunked* gram
accumulation over the P axis rather than by splitting rows.

All code here is host-side NumPy preprocessing; device placement/sharding
happens in the solver.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import numpy as np

from recommendation_models_tpu.config import DataConfig


def _pad_size(deg: int, min_bucket: int, max_bucket: int) -> int:
    """Padded degree for a row: next power of two, clipped below by
    ``min_bucket``; above ``max_bucket``, round up to a multiple of
    ``max_bucket`` instead (bounds distinct compiled shapes and padding
    waste for whale rows)."""
    if deg <= min_bucket:
        return min_bucket
    if deg <= max_bucket:
        return 1 << int(np.ceil(np.log2(deg)))
    return int(max_bucket * -(-deg // max_bucket))


@dataclasses.dataclass
class Bucket:
    """One degree bucket: ``B`` row *segments* padded to degree ``P``.

    ``row_ids`` uses ``n_rows`` (out of range) as the sentinel for padding
    rows so results scatter with ``mode='drop'``. A whale row split across
    several segments appears several times with the same id — consumers must
    scatter-ADD partial gram/rhs contributions, never overwrite.
    """

    pad: int                 # P
    row_ids: np.ndarray      # (B,) int32
    indices: np.ndarray      # (B, P) int32, 0 where padded
    values: np.ndarray       # (B, P) float32, 0 where padded
    mask: np.ndarray         # (B, P) float32, 1 real / 0 pad

    @property
    def n_rows(self) -> int:
        return self.row_ids.shape[0]


@dataclasses.dataclass
class PaddedLayout:
    """Bucketed padded layout of one orientation (users-major or items-major)."""

    n_rows: int
    n_cols: int
    nnz: int
    buckets: Tuple[Bucket, ...]

    @property
    def padded_slots(self) -> int:
        return sum(b.n_rows * b.pad for b in self.buckets)

    def padding_waste(self) -> float:
        """Fraction of padded slots that are padding (FLOP waste estimate)."""
        tot = self.padded_slots
        return 1.0 - self.nnz / tot if tot else 0.0


@dataclasses.dataclass
class ShardedLayout:
    """Per-shard stacked buckets for shard_map execution (SURVEY.md N4).

    Rows are assigned to ``n_shards`` contiguous blocks of size
    ``rows_per_shard``. Each bucket is stacked into ``(S, B, P)`` arrays with
    identical ``(B, P)`` on every shard (padded up to the max over shards);
    ``row_ids`` are *local* to the shard (sentinel = ``rows_per_shard``).
    """

    n_rows: int
    n_cols: int
    nnz: int
    n_shards: int
    rows_per_shard: int
    pads: Tuple[int, ...]            # P per bucket
    row_ids: Tuple[np.ndarray, ...]  # each (S, B) int32, local ids
    indices: Tuple[np.ndarray, ...]  # each (S, B, P) int32, global col ids
    values: Tuple[np.ndarray, ...]   # each (S, B, P) float32
    mask: Tuple[np.ndarray, ...]     # each (S, B, P) float32


def build_layout(
    indptr: np.ndarray,
    indices: np.ndarray,
    data: np.ndarray,
    n_rows: int,
    n_cols: int,
    config: Optional[DataConfig] = None,
) -> PaddedLayout:
    """Build the bucketed padded layout from CSR arrays.

    Fully vectorized (O(nnz)); no per-row Python loops even host-side.
    """
    cfg = config or DataConfig()
    indptr = np.asarray(indptr, dtype=np.int64)
    indices = np.asarray(indices, dtype=np.int32)
    data = np.asarray(data, dtype=np.float32)
    degrees = np.diff(indptr).astype(np.int64)
    nnz = int(degrees.sum())
    S = int(cfg.max_bucket)

    # Whale splitting: a row with degree > S becomes ceil(deg/S) SEGMENTS of
    # <= S observations each, all carrying the same row id. Gram matrices
    # are additive, so partial normal equations scatter-ADD into the row's
    # dense (k, k) system downstream — turning what was a deep serial chunk
    # scan over one huge padded row into batch parallelism across segments
    # (SURVEY.md §5 "long-context" analog; §7 hard part 1). Zero-degree rows
    # keep one empty segment so every factor row stays defined.
    n_segs = np.maximum(-(-degrees // S), 1)
    seg_row = np.repeat(np.arange(n_rows, dtype=np.int64), n_segs)
    seg_off = (np.arange(seg_row.shape[0], dtype=np.int64)
               - np.repeat(np.cumsum(n_segs) - n_segs, n_segs))
    seg_deg = np.clip(degrees[seg_row] - seg_off * S, 0, S)
    seg_start = indptr[seg_row] + seg_off * S

    # Padded size per segment -> bucket key (always <= S now). Bucket sizes
    # form a geometric grid (ratio cfg.bucket_growth, 8-aligned) between
    # min_bucket and S: finer-than-pow2 grids cut padding waste on
    # heavy-tailed degree distributions at the cost of a few more compiled
    # bucket shapes.
    growth = max(float(getattr(cfg, "bucket_growth", 2.0)), 1.05)
    grid = [int(cfg.min_bucket)]
    while grid[-1] < S:
        nxt = max(int(np.ceil(grid[-1] * growth / 8.0)) * 8, grid[-1] + 8)
        grid.append(min(nxt, S))
    grid = np.asarray(grid, dtype=np.int64)
    pads = grid[np.searchsorted(grid, seg_deg)]

    buckets = []
    for pad in np.unique(pads):
        pad = int(pad)
        sel = np.flatnonzero(pads == pad)
        deg = seg_deg[sel]
        b_real = sel.shape[0]
        b = int(-(-b_real // cfg.row_multiple) * cfg.row_multiple)

        row_ids = np.full(b, n_rows, dtype=np.int32)
        row_ids[:b_real] = seg_row[sel].astype(np.int32)
        idx = np.zeros((b, pad), dtype=np.int32)
        val = np.zeros((b, pad), dtype=np.float32)
        msk = np.zeros((b, pad), dtype=np.float32)

        total = int(deg.sum())
        if total:
            cum = np.cumsum(deg)
            within = np.arange(total, dtype=np.int64) - np.repeat(cum - deg, deg)
            src = np.repeat(seg_start[sel], deg) + within
            rowpos = np.repeat(np.arange(b_real, dtype=np.int64), deg)
            idx[rowpos, within] = indices[src]
            val[rowpos, within] = data[src]
            msk[rowpos, within] = 1.0

        buckets.append(Bucket(pad=pad, row_ids=row_ids, indices=idx,
                              values=val, mask=msk))

    return PaddedLayout(n_rows=n_rows, n_cols=n_cols, nnz=nnz,
                        buckets=tuple(buckets))


def layout_from_coo(
    rows: np.ndarray,
    cols: np.ndarray,
    vals: np.ndarray,
    n_rows: int,
    n_cols: int,
    config: Optional[DataConfig] = None,
    transpose: bool = False,
) -> PaddedLayout:
    """Build a layout straight from COO triplets (optionally of the transpose,
    for the item half-sweep). Sorts into CSR internally."""
    rows = np.asarray(rows)
    cols = np.asarray(cols)
    vals = np.asarray(vals, dtype=np.float32)
    if transpose:
        rows, cols = cols, rows
        n_rows, n_cols = n_cols, n_rows
    order = np.argsort(rows, kind="stable")
    rows_s, cols_s, vals_s = rows[order], cols[order], vals[order]
    counts = np.bincount(rows_s, minlength=n_rows)
    indptr = np.concatenate([[0], np.cumsum(counts)])
    return build_layout(indptr, cols_s, vals_s, n_rows, n_cols, config)


def csr_arrays(R) -> Tuple[np.ndarray, np.ndarray, np.ndarray, int, int]:
    """Accept scipy.sparse (any format) or dense ndarray; return CSR arrays.

    Mirrors the reference's input validation: its estimators take the rating
    matrix as scipy CSR (SURVEY.md §2.1 row 1); we additionally accept dense.
    """
    try:
        import scipy.sparse as sp
        if sp.issparse(R):
            R = R.tocsr()
            return (np.asarray(R.indptr), np.asarray(R.indices),
                    np.asarray(R.data, dtype=np.float32), R.shape[0], R.shape[1])
    except ImportError:  # pragma: no cover - scipy is baked in
        pass
    R = np.asarray(R)
    if R.ndim != 2:
        raise ValueError(f"ratings must be 2-D, got shape {R.shape}")
    rows, cols = np.nonzero(R)
    vals = R[rows, cols].astype(np.float32)
    counts = np.bincount(rows, minlength=R.shape[0])
    indptr = np.concatenate([[0], np.cumsum(counts)])
    return indptr, cols.astype(np.int32), vals, R.shape[0], R.shape[1]


def shard_layout(layout: PaddedLayout, n_shards: int) -> ShardedLayout:
    """Re-stack a PaddedLayout into per-shard blocks with identical shapes.

    Row ``r`` lives on shard ``r // rows_per_shard``; its factor row lives in
    the shard-local slice of the row-sharded table (SURVEY.md N4). Bucket
    shapes are padded to the per-bucket max across shards so a single
    shard_map body covers every shard.
    """
    rows_per_shard = -(-layout.n_rows // n_shards)
    pads, all_rid, all_idx, all_val, all_msk = [], [], [], [], []
    for b in layout.buckets:
        real = b.row_ids < layout.n_rows
        shard_of = np.where(real, b.row_ids // rows_per_shard, -1)
        counts = np.bincount(shard_of[shard_of >= 0], minlength=n_shards)
        bmax = max(int(counts.max()) if counts.size else 0, 1)
        bmax = -(-bmax // 8) * 8  # sublane alignment
        rid = np.full((n_shards, bmax), rows_per_shard, dtype=np.int32)
        idx = np.zeros((n_shards, bmax, b.pad), dtype=np.int32)
        val = np.zeros((n_shards, bmax, b.pad), dtype=np.float32)
        msk = np.zeros((n_shards, bmax, b.pad), dtype=np.float32)
        for s in range(n_shards):
            take = np.flatnonzero(shard_of == s)
            k = take.shape[0]
            rid[s, :k] = b.row_ids[take] - s * rows_per_shard
            idx[s, :k] = b.indices[take]
            val[s, :k] = b.values[take]
            msk[s, :k] = b.mask[take]
        pads.append(b.pad)
        all_rid.append(rid)
        all_idx.append(idx)
        all_val.append(val)
        all_msk.append(msk)
    return ShardedLayout(
        n_rows=layout.n_rows, n_cols=layout.n_cols, nnz=layout.nnz,
        n_shards=n_shards, rows_per_shard=rows_per_shard,
        pads=tuple(pads), row_ids=tuple(all_rid), indices=tuple(all_idx),
        values=tuple(all_val), mask=tuple(all_msk),
    )


__all__ = [
    "Bucket", "PaddedLayout", "ShardedLayout",
    "build_layout", "layout_from_coo", "csr_arrays", "shard_layout",
]
