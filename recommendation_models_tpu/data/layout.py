"""CSR ratings -> TPU-friendly padded segment-gather layout (SURVEY.md N1).

The reference stores ratings as a `scipy.sparse` CSR matrix and slices one
ragged row per Python-loop iteration (SURVEY.md §2.1 row 1, §3.1). TPUs want
static shapes, so we re-lay CSR out as *degree-bucketed padded blocks*
(ELL-style): rows are grouped by padded degree (powers of two), each bucket is
a dense ``(B, P)`` block of column indices / values / mask. Every bucket is a
single static-shape vmapped solve; padding rows/slots carry mask 0 and
contribute exactly zero (tested).

Degree skew is the "long-context" analog here (SURVEY.md §5): bucketing keeps
padding waste bounded, whale rows live whole in wide ``max_bucket``-aligned
buckets (handled downstream by *chunked* gram accumulation over the P axis),
and every row appears in exactly one bucket so bucket solves are independent.

All code here is host-side NumPy preprocessing; device placement/sharding
happens in the solver.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import numpy as np

from recommendation_models_tpu.config import DataConfig


@dataclasses.dataclass
class Bucket:
    """One degree bucket: ``B`` rows padded to degree ``P``.

    ``row_ids`` uses ``n_rows`` (out of range) as the sentinel for padding
    rows so results scatter with ``mode='drop'``. Every real row appears in
    EXACTLY ONE bucket (whale rows stay whole in wide ``max_bucket``-aligned
    buckets), so each bucket's solved factors can be scatter-SET into the
    table independently — no cross-bucket normal-equation accumulation.
    """

    pad: int                 # P
    row_ids: np.ndarray      # (B,) int32
    indices: np.ndarray      # (B, P) int32, 0 where padded
    values: np.ndarray       # (B, P) float32, 0 where padded
    mask: np.ndarray         # (B, P) float32, 1 real / 0 pad
    # (B, C) float16 ratings of this bucket's rows against the layout's hot
    # columns (PaddedLayout.hot_ids), 0 = unobserved; None when no hot block.
    hot_vals: Optional[np.ndarray] = None

    @property
    def n_rows(self) -> int:
        return self.row_ids.shape[0]


@dataclasses.dataclass
class PaddedLayout:
    """Bucketed padded layout of one orientation (users-major or items-major).

    ``dense_ids``/``dense_vals`` hold the dense-whale block (rows solved via
    the dense gramian matmul, config.DataConfig.dense_whales): ids (W,) and
    a dense (W, n_cols) value matrix (0 = unobserved). These rows appear in
    NO bucket.

    ``hot_ids`` holds the dense-HOT-COLUMN block (config.DataConfig.
    hot_cols): the C most popular columns, whose observations are removed
    from every bucket's index/value blocks and stored densely per bucket as
    ``Bucket.hot_vals`` (B, C). Their gram contribution is one MXU matmul
    against the C outer products — the transpose of the whale-row trick,
    targeting the Zipf HEAD of the column-popularity distribution the way
    dense rows target the degree tail. Dense-block rows keep their hot
    columns inside ``dense_vals`` (their hot_vals rows are zero).
    """

    n_rows: int
    n_cols: int
    nnz: int
    buckets: Tuple[Bucket, ...]
    dense_ids: Optional[np.ndarray] = None
    dense_vals: Optional[np.ndarray] = None
    hot_ids: Optional[np.ndarray] = None

    @property
    def padded_slots(self) -> int:
        return sum(b.n_rows * b.pad for b in self.buckets)

    def padding_waste(self) -> float:
        """Fraction of padded slots that are padding (FLOP waste estimate;
        bucketed rows only — the dense/hot blocks have no padding concept)."""
        tot = self.padded_slots
        if not tot:
            return 0.0
        dense_nnz = (np.count_nonzero(self.dense_vals)
                     if self.dense_vals is not None else 0)
        hot_nnz = sum(int(np.count_nonzero(b.hot_vals))
                      for b in self.buckets if b.hot_vals is not None)
        return 1.0 - (self.nnz - dense_nnz - hot_nnz) / tot


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
    # Dense-whale block, row-sharded like the buckets: ids are LOCAL (the
    # sentinel is rows_per_shard, scatter-dropped), vals keep GLOBAL column
    # order (valid only for 'allgather' exchange, where each shard sees the
    # full opposite table). None when the layout has no dense block.
    dense_ids: Optional[np.ndarray] = None   # (S, Wmax) int32 local ids
    dense_vals: Optional[np.ndarray] = None  # (S, Wmax, n_cols) float16
    # Hot-column block: the C global column ids (replicated — every shard
    # gathers the same opposite-table rows) and per-bucket (S, B, C) f16
    # value slabs aligned with row_ids. None when no hot block.
    hot_ids: Optional[np.ndarray] = None
    hot_vals: Optional[Tuple[np.ndarray, ...]] = None


def build_layout(
    indptr: np.ndarray,
    indices: np.ndarray,
    data: np.ndarray,
    n_rows: int,
    n_cols: int,
    config: Optional[DataConfig] = None,
) -> PaddedLayout:
    """Build the bucketed padded layout from CSR arrays.

    Vectorized O(nnz) on the bucket path (one Python loop per DENSE WHALE
    row remains — ~thousands of iterations at most under the budget cap).
    """
    cfg = config or DataConfig()
    indptr = np.asarray(indptr, dtype=np.int64)
    indices = np.asarray(indices, dtype=np.int32)
    data = np.asarray(data, dtype=np.float32)
    degrees = np.diff(indptr).astype(np.int64)
    nnz = int(degrees.sum())
    # loud bounds validation (r4 review): an out-of-range column id would
    # otherwise flow into jnp.take's default CLIP mode on device and
    # silently substitute the last factor row (wrong answers, no error)
    if degrees.shape[0] != n_rows:
        raise ValueError(f"indptr describes {degrees.shape[0]} rows but "
                         f"n_rows={n_rows}")
    if indices.size and (int(indices.max()) >= n_cols or int(indices.min()) < 0):
        raise ValueError(
            f"column ids must be in [0, {n_cols}); got "
            f"[{int(indices.min())}, {int(indices.max())}]")
    S = int(cfg.max_bucket)

    # Dense-whale block: densest rows first, while the (W, n_cols) f16
    # value matrix fits the budget (the cap math below uses 2 bytes per
    # entry). These rows skip bucketing entirely — their grams come from
    # one dense MXU matmul downstream (no gathers).
    dense_ids = dense_vals = None
    is_dense = np.zeros(n_rows, bool)
    # Dense/hot blocks encode "unobserved" as value 0, so an observation
    # with an EXPLICIT zero rating routed into them would silently become
    # unobserved (VERDICT r3 weak #6 — e.g. mean-centered ratings can
    # produce exact zeros). Detect once up front (cheap: one vectorized
    # compare, and only rows/columns actually routed to a block raise).
    has_zero_obs = bool(
        (getattr(cfg, "dense_whales", False) or getattr(cfg, "hot_cols", 0))
        and data.size and np.any(data == 0))
    if getattr(cfg, "dense_whales", False):
        # dense_vals is float16 (exact for half-star ratings; it only ever
        # feeds bf16/f32 matmul inputs) — halves HBM and doubles the budget.
        cap = max((cfg.dense_budget_mb * (1 << 20)) // (max(n_cols, 1) * 2), 0)
        thr = getattr(cfg, "dense_min_degree", None)
        # None = auto: plain builders take the measured rank-64 default
        # (estimator entry points resolve rank-aware before getting here)
        thr = 512 if thr is None else int(thr)
        thr = min(thr, S)
        cand = np.flatnonzero(degrees > thr)
        if cand.size and cap > 0:
            cand = cand[np.argsort(-degrees[cand], kind="stable")][:cap]
            dense_ids = np.sort(cand).astype(np.int32)
            is_dense[dense_ids] = True
            dense_vals = np.zeros((dense_ids.shape[0], n_cols), np.float16)
            for w, r in enumerate(dense_ids):
                lo, hi = indptr[r], indptr[r + 1]
                if np.unique(indices[lo:hi]).size != hi - lo:
                    raise ValueError(
                        f"row {r} has duplicate (row, col) observations "
                        "and is routed to the dense-whale block, whose "
                        "scatter is last-wins (the bucket path would sum "
                        "them) — canonicalize first (scipy "
                        "sum_duplicates(), or pre-sum the COO triplets)")
                if has_zero_obs and np.any(data[lo:hi] == 0):
                    raise ValueError(
                        f"row {r} has explicit zero-valued ratings and "
                        "would be routed to the dense-whale block, whose "
                        "value matrix encodes 0 = unobserved — the zeros "
                        "would silently be dropped. Shift ratings away "
                        "from exact 0, or build the layout with "
                        "DataConfig(dense_whales=False) / "
                        "ALS(dense_min_degree=<huge>) to disable the "
                        "dense block.")
                dense_vals[w, indices[lo:hi]] = data[lo:hi]

    # Dense hot-column block: the C most popular columns' observations move
    # out of the gather buckets into per-bucket (B, C) f16 slabs. Gathers
    # are index-processing-bound (~175M rows/s, locality/dtype-invariant,
    # scripts/ablate_gather.py), so a column is worth densifying when its
    # count exceeds the per-column slab cost: n_rows * k^2 * 2 / peak_flops
    # over the per-obs gather cost — about n_rows/64 at k=64 on v5e.
    hot_ids = None
    hot_slab = None
    row_of_obs = None
    if getattr(cfg, "hot_cols", 0):
        row_of_obs = np.repeat(np.arange(n_rows, dtype=np.int64), degrees)
        nd_obs = ~is_dense[row_of_obs] if is_dense.any() else slice(None)
        counts = np.bincount(indices[nd_obs], minlength=n_cols)
        thr = getattr(cfg, "hot_min_count", None)
        thr = max(n_rows // 64, 32) if thr is None else int(thr)
        cand = np.flatnonzero(counts >= thr)
        # hot_cols in 1..7 rounds C to 0: no block at all then (an EMPTY
        # hot_ids array downstream read as "has a hot block" — e.g.
        # build_exchange_plan's replication guard — r4 review)
        if cand.size >= 8 and int(cfg.hot_cols) >= 8:
            cand = cand[np.argsort(-counts[cand], kind="stable")]
            C = min(int(cfg.hot_cols), cand.size) // 8 * 8
            hot_ids = np.sort(cand[:C]).astype(np.int32)
            hot_rank = np.full(n_cols, -1, np.int64)
            hot_rank[hot_ids] = np.arange(C)
            obs_rank = hot_rank[indices]
            is_hot_obs = (obs_rank >= 0) & ~is_dense[row_of_obs]
            if has_zero_obs and np.any(data[is_hot_obs] == 0):
                bad = int(np.count_nonzero(data[is_hot_obs] == 0))
                raise ValueError(
                    f"{bad} explicit zero-valued rating(s) fall in hot "
                    "columns, whose slab encodes 0 = unobserved — they "
                    "would silently be dropped. Shift ratings away from "
                    "exact 0, or build with DataConfig(hot_cols=0) / "
                    "ALS(hot_cols=0) to disable the hot-column block.")
            hot_keys = (row_of_obs[is_hot_obs] * np.int64(C)
                        + obs_rank[is_hot_obs])
            if np.unique(hot_keys).size != hot_keys.size:
                raise ValueError(
                    "duplicate (row, col) observations fall in hot "
                    "columns, whose slab scatter is last-wins (the "
                    "bucket path would sum them) — canonicalize first "
                    "(scipy sum_duplicates(), or pre-sum the COO "
                    "triplets), or build with DataConfig(hot_cols=0)")
            # (n_rows+1, C): the extra zero row backs sentinel row ids
            hot_slab = np.zeros((n_rows + 1, C), np.float16)
            hot_slab[row_of_obs[is_hot_obs], obs_rank[is_hot_obs]] = \
                data[is_hot_obs]
            # residual CSR: everything except hot obs of non-dense rows
            keep = ~is_hot_obs
            indices = indices[keep]
            data = data[keep]
            degrees = np.bincount(row_of_obs[keep], minlength=n_rows
                                  ).astype(np.int64)
            indptr = np.concatenate(
                [np.zeros(1, np.int64), np.cumsum(degrees)])

    # Bucket widths form a geometric grid (ratio cfg.bucket_growth) between
    # min_bucket and S (8-aligned), then CONTINUE past S (S-aligned) so whale
    # rows stay whole in a few wide bucket classes: a whale's gram is chunk-
    # scanned over its padded width downstream (SURVEY.md §5 "long-context"
    # analog), while its row id stays unique across all buckets — that
    # uniqueness is what lets each bucket solve + scatter-SET independently,
    # with no dense cross-bucket scatter-ADD of (k, k) normal equations
    # (measured: XLA scatter-add of k^2-wide rows is ~5x slower than the
    # equivalent gather and dominated the ML-25M epoch). Finer-than-pow2
    # grids cut padding waste on heavy-tailed degree distributions at the
    # cost of a few more compiled bucket shapes.
    # None = unresolved auto (estimator entry points resolve it per rank
    # via config.bucket_growth_for_rank); plain builders take 1.25
    growth = max(float(getattr(cfg, "bucket_growth", None) or 1.25), 1.05)
    grid = [int(cfg.min_bucket)]
    while grid[-1] < S:
        nxt = max(int(np.ceil(grid[-1] * growth / 8.0)) * 8, grid[-1] + 8)
        grid.append(min(nxt, S))
    bucketed_deg = degrees[~is_dense]
    max_deg = int(bucketed_deg.max()) if bucketed_deg.size else 0
    align = max(8, min(S, 1024))  # whale widths stay on the geometric grid
    while grid[-1] < max_deg:     # (a full S-alignment would jump 2x at S)
        nxt = max(int(np.ceil(grid[-1] * growth / align)) * align,
                  grid[-1] + align)
        grid.append(nxt)
    grid = np.asarray(grid, dtype=np.int64)
    # (dense rows can exceed the grid top — they take no bucket; clip keeps
    # the searchsorted index in range)
    pads = grid[np.minimum(np.searchsorted(grid, degrees), grid.size - 1)]

    # Adaptive bucket merging (OPT-IN, default off): greedily lift a bucket
    # into the next wider pad while the extra padded slots stay under
    # bucket_merge_slack. History: isolated half-sweep probes measured wins
    # (ML-25M item side 15 -> 4 buckets, 154 -> 127 ms; a 3-bucket variant
    # even hit 107 ms) BUT the whole jitted epoch regressed 0.254 -> 0.439 s
    # at slack=500k — isolated probes keep failing to predict in-program
    # behavior on this workload (same lesson as the grouped-gather and
    # lane-packing experiments). Row-count-based merge rules were also
    # tried: strictly worse and composition-unstable (107-300 ms for the
    # same bucket COUNT depending on which pads fused). Left as a knob for
    # other dataset shapes; validate with whole-epoch numbers only.
    slack = int(getattr(cfg, "bucket_merge_slack", 0))
    if slack > 0:
        nd = ~is_dense if is_dense.any() else np.ones(n_rows, bool)
        uniq, cnts = np.unique(pads[nd], return_counts=True)
        remap = {}
        g_rows, g_pad, g_members = 0, -1, []
        for p, c in zip(uniq.tolist(), cnts.tolist()):
            lift = g_rows * (p - g_pad) if g_pad >= 0 else 0
            if g_pad >= 0 and lift <= slack:
                g_members.append(p)
                g_rows += c
            else:
                g_members, g_rows = [p], c
            g_pad = p
            for q in g_members:
                remap[q] = p
        if any(remap[q] != q for q in remap):
            tgt = np.asarray([remap[int(q)] for q in uniq], dtype=np.int64)
            pos = np.clip(np.searchsorted(uniq, pads), 0, uniq.size - 1)
            # dense rows' pads may not appear in uniq: leave them unchanged
            # (they take no bucket anyway)
            pads = np.where(uniq[pos] == pads, tgt[pos], pads)

    buckets = []
    for pad in np.unique(pads[~is_dense]) if is_dense.any() else np.unique(pads):
        pad = int(pad)
        sel = np.flatnonzero((pads == pad) & ~is_dense)  # row ids, this bucket
        deg = degrees[sel]
        b_real = sel.shape[0]
        b = int(-(-b_real // cfg.row_multiple) * cfg.row_multiple)

        row_ids = np.full(b, n_rows, dtype=np.int32)
        row_ids[:b_real] = sel.astype(np.int32)
        idx = np.zeros((b, pad), dtype=np.int32)
        val = np.zeros((b, pad), dtype=np.float32)
        msk = np.zeros((b, pad), dtype=np.float32)

        total = int(deg.sum())
        if total:
            cum = np.cumsum(deg)
            within = np.arange(total, dtype=np.int64) - np.repeat(cum - deg, deg)
            src = np.repeat(indptr[sel], deg) + within
            rowpos = np.repeat(np.arange(b_real, dtype=np.int64), deg)
            idx[rowpos, within] = indices[src]
            val[rowpos, within] = data[src]
            msk[rowpos, within] = 1.0

        buckets.append(Bucket(
            pad=pad, row_ids=row_ids, indices=idx, values=val, mask=msk,
            hot_vals=None if hot_slab is None else hot_slab[row_ids]))

    return PaddedLayout(n_rows=n_rows, n_cols=n_cols, nnz=nnz,
                        buckets=tuple(buckets),
                        dense_ids=dense_ids, dense_vals=dense_vals,
                        hot_ids=hot_ids)


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
            if not R.has_canonical_format:
                # canonicalize duplicates up front (scipy SUMS them): a
                # non-canonical CSR reaching the layout would count a
                # duplicated (row, col) twice on the bucket path but
                # last-wins on the dense/hot scatter paths (r4 review).
                # tocsr() on an already-CSR input does NOT dedup, so copy
                # then sum (never mutate the caller's matrix).
                R = R.copy()
                R.sum_duplicates()
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


def bucket_row_multiple(n_bucket_rows: int, row_multiple: int) -> int:
    """Row-count rounding multiple for one bucket: the solve kernel's
    batch block when the bucket is at least that big, else 8 — padding an
    8-row x 100k-wide whale bucket to the block would multiply its gather
    volume ~32x while the solver's pad copy of a tiny (B, k^2) G is free
    by comparison. The ONE shared definition for shard_layout and
    solver.als_sweep.device_buckets (r4 review: two verbatim copies could
    drift and give different bucket shapes sharded vs single-device)."""
    return row_multiple if n_bucket_rows >= row_multiple else 8


def shard_layout(layout: PaddedLayout, n_shards: int,
                 row_multiple: int = 8) -> ShardedLayout:
    """Re-stack a PaddedLayout into per-shard blocks with identical shapes.

    Row ``r`` lives on shard ``r // rows_per_shard``; its factor row lives in
    the shard-local slice of the row-sharded table (SURVEY.md N4). Bucket
    shapes are padded to the per-bucket max across shards so a single
    shard_map body covers every shard. ``row_multiple`` rounds each bucket's
    row count (pass the solve kernel's batch block so the solver never pays
    a whole-array pad copy).

    Dense-whale and hot-column blocks shard by row owner like the buckets
    (see ShardedLayout field docs). Their column ids stay GLOBAL, so a
    layout carrying them is only valid for 'allgather' exchange — the
    all_to_all path's compact exchanged table cannot serve global ids
    (callers build all_to_all layouts with dense_whales=False, hot_cols=0;
    parallel.exchange.build_exchange_plan enforces it).
    """
    rows_per_shard = -(-layout.n_rows // n_shards)
    has_hot = layout.hot_ids is not None
    pads, all_rid, all_idx, all_val, all_msk = [], [], [], [], []
    all_hv = [] if has_hot else None
    for b in layout.buckets:
        real = b.row_ids < layout.n_rows
        shard_of = np.where(real, b.row_ids // rows_per_shard, -1)
        counts = np.bincount(shard_of[shard_of >= 0], minlength=n_shards)
        bmax = max(int(counts.max()) if counts.size else 0, 1)
        # don't inflate small (whale) buckets to the solve block — the pad
        # copy of a tiny G is cheaper than 10-100x extra gather volume
        mult = bucket_row_multiple(bmax, row_multiple)
        bmax = -(-bmax // mult) * mult
        rid = np.full((n_shards, bmax), rows_per_shard, dtype=np.int32)
        idx = np.zeros((n_shards, bmax, b.pad), dtype=np.int32)
        val = np.zeros((n_shards, bmax, b.pad), dtype=np.float32)
        msk = np.zeros((n_shards, bmax, b.pad), dtype=np.float32)
        hv = (np.zeros((n_shards, bmax, b.hot_vals.shape[1]), np.float16)
              if has_hot else None)
        for s in range(n_shards):
            take = np.flatnonzero(shard_of == s)
            k = take.shape[0]
            rid[s, :k] = b.row_ids[take] - s * rows_per_shard
            idx[s, :k] = b.indices[take]
            val[s, :k] = b.values[take]
            msk[s, :k] = b.mask[take]
            if has_hot:
                hv[s, :k] = b.hot_vals[take]
        pads.append(b.pad)
        all_rid.append(rid)
        all_idx.append(idx)
        all_val.append(val)
        all_msk.append(msk)
        if has_hot:
            all_hv.append(hv)
    dense_ids = dense_vals = None
    if layout.dense_ids is not None:
        shard_of = layout.dense_ids // rows_per_shard
        counts = np.bincount(shard_of, minlength=n_shards)
        wmax = -(-max(int(counts.max()), 1) // 8) * 8
        dense_ids = np.full((n_shards, wmax), rows_per_shard, np.int32)
        dense_vals = np.zeros((n_shards, wmax, layout.n_cols), np.float16)
        for s in range(n_shards):
            take = np.flatnonzero(shard_of == s)
            k = take.shape[0]
            dense_ids[s, :k] = layout.dense_ids[take] - s * rows_per_shard
            dense_vals[s, :k] = layout.dense_vals[take]
    return ShardedLayout(
        n_rows=layout.n_rows, n_cols=layout.n_cols, nnz=layout.nnz,
        n_shards=n_shards, rows_per_shard=rows_per_shard,
        pads=tuple(pads), row_ids=tuple(all_rid), indices=tuple(all_idx),
        values=tuple(all_val), mask=tuple(all_msk),
        dense_ids=dense_ids, dense_vals=dense_vals,
        hot_ids=(np.asarray(layout.hot_ids) if has_hot else None),
        hot_vals=(tuple(all_hv) if has_hot else None),
    )


__all__ = [
    "Bucket", "PaddedLayout", "ShardedLayout",
    "build_layout", "layout_from_coo", "csr_arrays", "shard_layout",
]
