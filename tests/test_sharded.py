"""Multi-device sharding tests on the 8-device CPU mesh (SURVEY.md §4.2-2).

Shard-count invariance: the 1-device result equals the 8-device result for
both exchange modes and both objectives.
"""

import numpy as np
import pytest

from recommendation_models_tpu.models.als import ALS
from tests.conftest import tiny_problem


def _init(n_users, n_items, rank, seed=0):
    rng = np.random.default_rng(seed)
    return (0.1 * rng.standard_normal((n_users, rank)).astype(np.float32),
            0.1 * rng.standard_normal((n_items, rank)).astype(np.float32))


@pytest.mark.parametrize("exchange", ["allgather", "all_to_all", "hybrid"])
@pytest.mark.parametrize("alpha", [None, 0.5])
def test_shard_count_invariance(exchange, alpha, cpu_mesh):
    R = tiny_problem(50, 40, density=0.25, seed=30)
    U0, V0 = _init(*R.shape, rank=6, seed=6)

    ref = ALS(rank=6, reg=0.3, alpha=alpha, n_sweeps=3).fit(R, U0=U0, V0=V0)
    shd = ALS(rank=6, reg=0.3, alpha=alpha, n_sweeps=3,
              n_shards=8, exchange=exchange, platform="cpu").fit(
                  R, U0=U0, V0=V0)

    np.testing.assert_allclose(shd.U_, ref.U_, rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(shd.V_, ref.V_, rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(shd.history_, ref.history_, rtol=1e-3, atol=1e-4)


def test_sharded_uneven_rows(cpu_mesh):
    # n_users=13, n_items=9 not divisible by 8 shards: padding path
    R = tiny_problem(13, 9, density=0.5, seed=31)
    U0, V0 = _init(13, 9, rank=4, seed=7)
    ref = ALS(rank=4, reg=0.2, n_sweeps=2).fit(R, U0=U0, V0=V0)
    shd = ALS(rank=4, reg=0.2, n_sweeps=2, n_shards=8,
              platform="cpu").fit(R, U0=U0, V0=V0)
    np.testing.assert_allclose(shd.U_, ref.U_, rtol=2e-3, atol=2e-3)


def test_sharded_random_init_runs(cpu_mesh):
    R = tiny_problem(40, 30, seed=32)
    m = ALS(rank=5, n_sweeps=2, n_shards=4, platform="cpu").fit(R)
    assert m.U_.shape == (40, 5)
    assert np.isfinite(m.history_).all()


@pytest.mark.parametrize("alpha", [None, 0.5])
def test_sharded_allgather_dense_hot_parity(alpha, cpu_mesh):
    """'allgather' sharding keeps the dense-whale + hot-column fast paths
    (all_to_all cannot: global column ids need the full opposite table).
    Force both blocks on a tiny problem and check parity with unsharded."""
    R = tiny_problem(96, 40, density=0.5, seed=33)
    U0, V0 = _init(96, 40, rank=8, seed=8)
    kw = dict(rank=8, reg=0.3, alpha=alpha, n_sweeps=3, hot_cols=8,
              dense_min_degree=26, max_bucket=32)

    # the forced config must actually produce both special blocks
    from recommendation_models_tpu.data.layout import build_layout, csr_arrays
    indptr, indices, data, nu, ni = csr_arrays(R)
    lay = build_layout(indptr, indices, data, nu, ni,
                       ALS(**kw)._data_config())
    assert lay.dense_ids is not None and len(lay.dense_ids) > 0
    assert lay.hot_ids is not None and len(lay.hot_ids) > 0

    ref = ALS(**kw).fit(R, U0=U0, V0=V0)
    shd = ALS(**kw, n_shards=8, exchange="allgather",
              platform="cpu").fit(R, U0=U0, V0=V0)
    np.testing.assert_allclose(shd.U_, ref.U_, rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(shd.V_, ref.V_, rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(shd.history_, ref.history_,
                               rtol=1e-3, atol=1e-4)


def test_hybrid_keeps_hot_column_path(cpu_mesh):
    """'hybrid' replicates the Zipf head, so the hot-column fast path stays
    enabled in the sharded program (hot_ids remap into the head block):
    parity with the unsharded fit that uses the same hot block."""
    R = tiny_problem(96, 40, density=0.5, seed=34)
    U0, V0 = _init(96, 40, rank=8, seed=9)
    # dense_min_degree above any row degree: no dense block (the sharded
    # hybrid build disables dense anyway; the ref must match)
    kw = dict(rank=8, reg=0.3, n_sweeps=3, hot_cols=8,
              dense_min_degree=10_000, max_bucket=32)

    ref = ALS(**kw).fit(R, U0=U0, V0=V0)
    shd = ALS(**kw, n_shards=8, exchange="hybrid", exchange_head=12,
              platform="cpu").fit(R, U0=U0, V0=V0)
    # the sharded layout really carried the hot block (head >= hot set)
    up = shd._sharded_program._uplan_host
    assert up.remapped_hot is not None and up.remapped_hot.shape[0] == 8
    assert up.head_size >= 12
    np.testing.assert_allclose(shd.U_, ref.U_, rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(shd.V_, ref.V_, rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(shd.history_, ref.history_,
                               rtol=1e-3, atol=1e-4)


def test_device_resident_sharded_serving(cpu_mesh):
    """After a sharded fit, recommend() serves from the mesh: no full-table
    host fetch ever happens (VERDICT r1 next-step 6; SURVEY.md §3.5/N9),
    exclusion works, and padded shard rows never surface as candidates."""
    # 500 items over 8 shards with row_multiple padding => padded zero rows
    R = tiny_problem(60, 500, density=0.08, seed=40)
    m = ALS(rank=6, reg=0.2, n_sweeps=2, n_shards=8, platform="cpu").fit(R)
    assert m._U_host is None and m._V_host is None   # nothing fetched yet
    users = np.arange(48)
    sc, it = m.recommend(users, n=7, exclude_seen=True, method="exact")
    # ... and serving itself fetched no full table
    assert m._U_host is None and m._V_host is None
    assert it.shape == (48, 7) and (it >= 0).all() and (it < 500).all()

    # parity with the host reference on the SAME factors (fetch is fine in
    # the test); exclusion must hold exactly
    U, V = m.U_, m.V_
    scores = U[users] @ V.T
    Rl = R.tolil()
    for i, u in enumerate(users):
        seen = Rl.rows[u]
        assert not set(it[i]) & set(seen)
        scores[i, seen] = -np.inf
    np.testing.assert_allclose(np.asarray(sc)[:, 0],
                               scores[np.arange(48), it[:, 0]], rtol=1e-5)
    # exact method => the best unseen item really is rank 1
    np.testing.assert_allclose(np.asarray(sc)[:, 0], scores.max(1), rtol=1e-5)

    # pickling materializes factors and drops device handles
    import pickle
    m2 = pickle.loads(pickle.dumps(m))
    np.testing.assert_allclose(m2.U_, U)
    sc2, it2 = m2.recommend(users[:5], n=7, exclude_seen=True,
                            method="exact")
    np.testing.assert_allclose(sc2, sc[:5], rtol=1e-5)


def test_sharded_dense_block_with_nondivisible_catalog(cpu_mesh):
    """Sharded allgather fit WITH a populated dense-whale block on a
    catalog that does not divide the shard count: the allgathered opposite
    table is padded past n_cols, and dense_gram_rhs must iterate the value
    matrix's width, not the padded table rows (fuzz-found shape error)."""
    n_users, n_items = 45, 39                  # 39 % 8 != 0, 45 % 8 != 0
    R = tiny_problem(n_users, n_items, density=0.5, seed=77)
    U0, V0 = _init(n_users, n_items, rank=4, seed=3)
    kw = dict(rank=4, reg=0.3, n_sweeps=2, dense_min_degree=8, hot_cols=0)
    single = ALS(**kw).fit(R, U0=U0, V0=V0)
    # confirm the dense block is actually populated in this problem
    ul, _ = single._build_layouts(*__import__(
        "recommendation_models_tpu.data.layout",
        fromlist=["csr_arrays"]).csr_arrays(R)[:3], n_users, n_items,
        single._data_config())
    assert ul.dense_ids is not None and ul.dense_ids.size > 0
    sharded = ALS(**kw, n_shards=8, platform="cpu").fit(R, U0=U0, V0=V0)
    np.testing.assert_allclose(sharded.U_, single.U_, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(sharded.history_, single.history_, rtol=1e-4)


def test_collective_bytes_accounting(cpu_mesh):
    """Every sharded fit exposes its per-sweep ICI traffic. The allgather
    number matches the (S-1) * css * k * 4 identity per half, and on a
    SPARSE problem (unique requests << table size — the regime the compact
    exchanges exist for) all_to_all and hybrid move fewer bytes."""
    R = tiny_problem(128, 384, density=0.02, seed=35)
    U0, V0 = _init(128, 384, rank=4, seed=10)
    out = {}
    for ex in ("allgather", "all_to_all", "hybrid"):
        m = ALS(rank=4, reg=0.2, n_sweeps=1, n_shards=8, exchange=ex,
                exchange_head=8, platform="cpu").fit(R, U0=U0, V0=V0)
        b = m.exchange_bytes_per_sweep_
        assert b["per_sweep_total"] > 0 and "user_half" in b
        # a STANDALONE train_sse call re-runs the user-half exchange (the
        # fit paths no longer do — per-sweep SSE rides the item half's
        # solves); the with-sse number prices that out-of-band call
        assert b["per_sweep_with_sse"] == (b["per_sweep_total"]
                                           + b["user_half"])
        out[ex] = b["per_sweep_total"]
    prog = m._sharded_program
    # user half receives the ITEM table (css = ipr) and vice versa
    assert out["allgather"] == 7 * (prog.ipr + prog.upr) * 4 * 4
    # tail-only padding efficiency is a real fraction
    eff = prog._uplan_host.padding_efficiency()
    assert 0.0 <= eff <= 1.0
    # requests << table rows here: compact exchange beats replication
    assert out["all_to_all"] < out["allgather"]
    assert out["hybrid"] < out["allgather"]
