"""Padded segment-gather layout tests (SURVEY.md N1)."""

import numpy as np
import scipy.sparse as sp

from recommendation_models_tpu.config import DataConfig
from recommendation_models_tpu.data.layout import (
    build_layout, csr_arrays, layout_from_coo, shard_layout,
)
from tests.conftest import tiny_problem


def _reconstruct(layout):
    """Rebuild the dense matrix from a PaddedLayout."""
    R = np.zeros((layout.n_rows, layout.n_cols), np.float32)
    for b in layout.buckets:
        for rid, idx, val, msk in zip(b.row_ids, b.indices, b.values, b.mask):
            if rid >= layout.n_rows:
                assert msk.sum() == 0
                continue
            real = msk > 0
            R[rid, idx[real]] += val[real]
    return R


def test_roundtrip_dense():
    R = tiny_problem(30, 20, density=0.3, seed=1)
    layout = build_layout(R.indptr, R.indices, R.data, *R.shape)
    np.testing.assert_allclose(_reconstruct(layout), R.toarray(), rtol=1e-6)
    assert layout.nnz == R.nnz


def test_bucket_shapes_are_aligned_and_bounded():
    R = tiny_problem(64, 200, density=0.1, seed=2)
    cfg = DataConfig(min_bucket=8, max_bucket=64)
    layout = build_layout(R.indptr, R.indices, R.data, *R.shape, config=cfg)
    for b in layout.buckets:
        assert b.pad >= 8
        assert b.pad % 8 == 0           # sublane-aligned bucket widths
        assert b.pad <= 64              # whale segments bounded by max
        assert b.n_rows % 8 == 0
        # each row's degree fits its bucket
        degs = b.mask.sum(1)
        assert (degs <= b.pad).all()


def test_whale_rows_go_dense():
    # one row with degree 300, max_bucket 64 -> the row moves to the DENSE
    # gramian block: its ratings live in a (1, n_cols) dense matrix and it
    # appears in no gather bucket.
    rows = np.zeros(300, np.int64)
    cols = np.arange(300)
    vals = (np.arange(300) + 1).astype(np.float32)
    cfg = DataConfig(max_bucket=64)
    layout = layout_from_coo(rows, cols, vals, 1, 300, config=cfg)
    np.testing.assert_array_equal(layout.dense_ids, [0])
    np.testing.assert_allclose(layout.dense_vals[0], vals)
    assert not any((b.row_ids == 0).any() for b in layout.buckets)


def test_whale_rows_stay_whole_without_dense():
    # with the dense block disabled (sharded execution), the whale stays
    # WHOLE in a wide max_bucket-aligned bucket — row ids stay unique.
    rows = np.zeros(300, np.int64)
    cols = np.arange(300)
    vals = np.arange(300).astype(np.float32)
    cfg = DataConfig(max_bucket=64, dense_whales=False)
    layout = layout_from_coo(rows, cols, vals, 1, 300, config=cfg)
    assert layout.dense_ids is None
    seg_rows = np.concatenate([b.row_ids[b.row_ids < 1]
                               for b in layout.buckets])
    assert seg_rows.shape[0] == 1 and (seg_rows == 0).all()
    whale = [b for b in layout.buckets if (b.row_ids == 0).any()][0]
    assert whale.pad >= 300 and whale.pad % 64 == 0
    got = np.concatenate([b.values[b.mask > 0].ravel()
                          for b in layout.buckets])
    np.testing.assert_array_equal(np.sort(got), vals)


def test_row_ids_unique_across_buckets_and_dense():
    # heavy-tailed degrees: every real row id appears exactly once, in
    # either a gather bucket or the dense block
    rng = np.random.default_rng(11)
    rows = np.repeat(np.arange(40), np.minimum(
        (rng.pareto(1.0, 40) * 10 + 1).astype(int), 400))
    cols = np.concatenate([rng.choice(500, size=(rows == r).sum(),
                                      replace=False) for r in range(40)])
    vals = np.ones_like(cols, np.float32)
    layout = layout_from_coo(rows, cols, vals, 40, 500,
                             config=DataConfig(max_bucket=16))
    seen = np.concatenate(
        [b.row_ids[b.row_ids < 40] for b in layout.buckets]
        + ([layout.dense_ids] if layout.dense_ids is not None else []))
    assert sorted(seen.tolist()) == list(range(40))


def test_empty_rows_kept():
    R = np.zeros((5, 4), np.float32)
    R[0, 1] = 2.0
    indptr, indices, data, nr, nc = csr_arrays(R)
    layout = build_layout(indptr, indices, data, nr, nc)
    seen = np.concatenate([b.row_ids[b.row_ids < nr] for b in layout.buckets])
    assert set(seen.tolist()) == set(range(5))


def test_csr_arrays_accepts_sparse_and_dense():
    R = tiny_problem(10, 8, seed=3)
    a = csr_arrays(R)
    b = csr_arrays(R.toarray())
    np.testing.assert_array_equal(a[0], b[0])
    np.testing.assert_array_equal(a[1], b[1])
    np.testing.assert_allclose(a[2], b[2])


def test_shard_layout_partition():
    R = tiny_problem(50, 40, seed=4)
    layout = build_layout(R.indptr, R.indices, R.data, *R.shape)
    sl = shard_layout(layout, 4)
    assert sl.rows_per_shard == 13  # ceil(50/4)
    dense = np.zeros(R.shape, np.float32)
    for bi in range(len(sl.pads)):
        for s in range(4):
            for rid, idx, val, msk in zip(sl.row_ids[bi][s], sl.indices[bi][s],
                                          sl.values[bi][s], sl.mask[bi][s]):
                if rid >= sl.rows_per_shard:
                    assert msk.sum() == 0
                    continue
                g = s * sl.rows_per_shard + rid
                real = msk > 0
                dense[g, idx[real]] += val[real]
    np.testing.assert_allclose(dense, R.toarray(), rtol=1e-6)
    # identical shapes across shards by construction
    for bi in range(len(sl.pads)):
        assert sl.indices[bi].shape[0] == 4


def test_padding_waste_reported():
    R = tiny_problem(100, 500, density=0.05, seed=5)
    layout = build_layout(R.indptr, R.indices, R.data, *R.shape)
    assert 0.0 <= layout.padding_waste() < 1.0


def test_layout_cache_roundtrip(tmp_path):
    from recommendation_models_tpu.data.layout_cache import (
        cached_layout, load_layout, save_layout)
    R = tiny_problem(40, 30, density=0.3, seed=7)
    layout = build_layout(R.indptr, R.indices, R.data, *R.shape)
    p = str(tmp_path / "layout.npz")
    save_layout(p, layout)
    back = load_layout(p)
    assert (back.n_rows, back.n_cols, back.nnz) == (
        layout.n_rows, layout.n_cols, layout.nnz)
    assert len(back.buckets) == len(layout.buckets)
    for a, b in zip(layout.buckets, back.buckets):
        assert a.pad == b.pad
        np.testing.assert_array_equal(a.row_ids, b.row_ids)
        np.testing.assert_array_equal(a.indices, b.indices)
        np.testing.assert_allclose(a.values, b.values)
        np.testing.assert_array_equal(a.mask, b.mask)

    calls = []
    def build():
        calls.append(1)
        return layout
    cached_layout(p, build)          # fresh cache -> no build
    assert not calls
    cached_layout(str(tmp_path / "other.npz"), build)   # missing -> builds
    assert len(calls) == 1


def test_bucket_merge_slack_correctness():
    """Opt-in bucket merging must be a pure layout transform: same solves,
    fewer buckets, padding contributes zero (whole-epoch perf validation
    lives in layout.py notes — this guards correctness only)."""
    from recommendation_models_tpu.config import DataConfig
    from recommendation_models_tpu.models.als import ALS
    from tests.conftest import tiny_problem
    R = tiny_problem(60, 45, density=0.3, seed=50)
    import numpy as np
    rng = np.random.default_rng(9)
    U0 = 0.1 * rng.standard_normal((60, 5)).astype(np.float32)
    V0 = 0.1 * rng.standard_normal((45, 5)).astype(np.float32)
    base = ALS(rank=5, reg=0.2, n_sweeps=3).fit(R, U0=U0, V0=V0)

    from recommendation_models_tpu.data.layout import build_layout, csr_arrays
    indptr, indices, data, nu, ni = csr_arrays(R)
    merged = build_layout(indptr, indices, data, nu, ni,
                          DataConfig(bucket_merge_slack=1_000_000))
    plain = build_layout(indptr, indices, data, nu, ni, DataConfig())
    assert len(merged.buckets) < len(plain.buckets)
    assert merged.nnz == plain.nnz

    from recommendation_models_tpu.solver.als_sweep import (
        device_buckets, make_sweep_fns)
    from recommendation_models_tpu.config import SolveConfig
    # the item orientation merged via the COO path (transpose)
    from recommendation_models_tpu.data.layout import layout_from_coo
    users = np.repeat(np.arange(nu), np.diff(indptr))
    item_merged = layout_from_coo(users, indices, data, nu, ni,
                                  DataConfig(bucket_merge_slack=1_000_000),
                                  transpose=True)
    scfg = SolveConfig(rank=5, reg=0.2)
    sweep, _ = make_sweep_fns(device_buckets(merged),
                              device_buckets(item_merged), nu, ni, scfg)
    import jax.numpy as jnp
    U, V = jnp.asarray(U0), jnp.asarray(V0)
    for _ in range(3):
        U, V = sweep(U, V)
    np.testing.assert_allclose(np.asarray(U), base.U_, rtol=2e-4, atol=2e-5)


def test_explicit_zero_ratings_raise_loudly_in_dense_and_hot_blocks():
    """VERDICT r3 weak #6: dense-whale / hot-column blocks encode 0 =
    unobserved, so an explicit zero rating routed into them must raise at
    layout build (e.g. mean-centered ratings can hit exact zeros) —
    never a silent value drop. Gather buckets carry a real mask and keep
    zeros exactly."""
    import pytest
    from recommendation_models_tpu.config import DataConfig
    from recommendation_models_tpu.data.layout import build_layout, csr_arrays
    import scipy.sparse as sp

    rng = np.random.default_rng(13)
    nu, ni = 30, 40
    # user 0 is a whale with one explicit-zero rating
    u = np.concatenate([np.zeros(36, np.int64),
                        rng.integers(1, nu, 150)])
    # tail obs concentrated in columns 0..7 so those are the hot columns
    # (the zero-valued obs sits in column 5 — inside the hot set)
    i = np.concatenate([np.arange(36), rng.integers(0, 8, 150)])
    v = rng.uniform(1, 5, u.shape[0]).astype(np.float32)
    v[5] = 0.0                       # explicit zero inside the whale row
    R = sp.csr_matrix((v, (u, i)), shape=(nu, ni))
    R.sum_duplicates()
    indptr, indices, data, _, _ = csr_arrays(R)
    assert np.any(data == 0)         # scipy kept the explicit zero

    with pytest.raises(ValueError, match="dense-whale"):
        build_layout(indptr, indices, data, nu, ni,
                     DataConfig(dense_min_degree=16, hot_cols=0))

    # hot columns: make column 0 hot and give it a zero-valued obs
    with pytest.raises(ValueError, match="hot columns"):
        build_layout(indptr, indices, data, nu, ni,
                     DataConfig(dense_whales=False, hot_cols=8,
                                hot_min_count=1))

    # workaround path: no dense/hot blocks => builds fine, zero preserved
    lay = build_layout(indptr, indices, data, nu, ni,
                       DataConfig(dense_whales=False, hot_cols=0))
    assert lay.nnz == data.shape[0]
    kept = np.concatenate([b.values[b.mask > 0] for b in lay.buckets])
    assert np.count_nonzero(kept == 0) == np.count_nonzero(data == 0)


def test_tiny_hot_cols_produces_no_empty_hot_block():
    """hot_cols in 1..7 rounds the block width to 0: the layout must carry
    hot_ids=None (an EMPTY array read as 'has a hot block' tripped
    build_exchange_plan's replication guard — r4 review)."""
    from recommendation_models_tpu.config import DataConfig
    from recommendation_models_tpu.data.layout import (
        build_layout, csr_arrays, shard_layout)
    from recommendation_models_tpu.parallel.exchange import (
        build_exchange_plan)
    import scipy.sparse as sp

    rng = np.random.default_rng(21)
    u = rng.integers(0, 40, 600)
    i = rng.integers(0, 16, 600)          # few columns => all hot-worthy
    v = rng.uniform(1, 5, 600).astype(np.float32)
    R = sp.csr_matrix((v, (u, i)), shape=(40, 16))
    R.sum_duplicates()
    indptr, indices, data, nu, ni = csr_arrays(R)
    lay = build_layout(indptr, indices, data, nu, ni,
                       DataConfig(dense_whales=False, hot_cols=4,
                                  hot_min_count=1))
    assert lay.hot_ids is None
    # and the exchange plan builds without the spurious replication error
    sl = shard_layout(lay, 4)
    plan = build_exchange_plan(sl, col_shard_size=sl.rows_per_shard, head=0)
    assert plan.head_size == 0


def test_out_of_range_column_ids_raise():
    """r4 review: out-of-range ids would flow into jnp.take's CLIP mode on
    device and silently substitute the last factor row."""
    import pytest
    indptr = np.array([0, 2], np.int64)
    indices = np.array([0, 4], np.int32)      # col 4 >= n_cols=4
    data = np.ones(2, np.float32)
    with pytest.raises(ValueError, match="column ids"):
        build_layout(indptr, indices, data, 1, 4)
    with pytest.raises(ValueError, match="n_rows"):
        build_layout(indptr, indices, data, 3, 8)   # indptr says 1 row


def test_duplicate_observations_canonicalized_or_loud():
    """scipy input is canonicalized (duplicates SUMMED, matching scipy COO
    semantics); raw duplicates routed to dense/hot blocks raise instead of
    silently keeping last-wins (r4 review)."""
    import pytest
    # csr_arrays canonicalizes a non-canonical CSR without mutating it
    R = sp.csr_matrix((np.array([1.0, 2.0, 3.0], np.float32),
                       (np.array([0, 0, 0]), np.array([1, 1, 2]))),
                      shape=(1, 4)).tocsr()
    # rebuild a non-canonical CSR explicitly
    R2 = sp.csr_matrix((np.array([1.0, 2.0, 3.0], np.float32),
                        np.array([1, 1, 2]), np.array([0, 3])),
                       shape=(1, 4))
    assert not R2.has_canonical_format
    indptr, indices, data, _, _ = csr_arrays(R2)
    assert indices.shape[0] == 2 and data[0] == 3.0   # summed
    assert not R2.has_canonical_format                # caller's not mutated

    # duplicates reaching a dense-whale row raise loudly
    rows = np.zeros(40, np.int64)
    cols = np.concatenate([np.arange(39), [0]])       # col 0 twice
    vals = np.ones(40, np.float32)
    with pytest.raises(ValueError, match="duplicate"):
        layout_from_coo(rows, cols, vals, 1, 39,
                        DataConfig(dense_min_degree=16, hot_cols=0))


def test_layout_cache_invalidated_by_any_config_knob(tmp_path):
    """r4 review: the cache tag must cover EVERY layout-shaping knob —
    changing max_bucket (or merge slack etc.) must rebuild, not silently
    reuse the stale cached layout."""
    from recommendation_models_tpu.models.als import ALS

    R = tiny_problem(40, 30, density=0.3, seed=8)
    prefix = str(tmp_path / "lc")
    m1 = ALS(rank=4, n_sweeps=1, layout_cache=prefix).fit(R)
    files1 = set(p.name for p in tmp_path.iterdir())
    m2 = ALS(rank=4, n_sweeps=1, layout_cache=prefix, max_bucket=64).fit(R)
    files2 = set(p.name for p in tmp_path.iterdir())
    assert files2 > files1          # new cache entries, not stale reuse
    m3 = ALS(rank=4, n_sweeps=1, layout_cache=prefix, min_bucket=16).fit(R)
    files3 = set(p.name for p in tmp_path.iterdir())
    assert files3 > files2
