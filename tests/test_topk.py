"""Top-k retrieval tests (SURVEY.md N9): single-device vs sharded vs NumPy."""

import numpy as np
import jax.numpy as jnp

from recommendation_models_tpu.ops.topk import sharded_topk, topk_scores


def _case(rng, b=5, n=100, k=8):
    U = rng.standard_normal((b, k)).astype(np.float32)
    V = rng.standard_normal((n, k)).astype(np.float32)
    return U, V


def test_topk_matches_numpy(rng):
    U, V = _case(rng)
    scores, items = topk_scores(jnp.asarray(U), jnp.asarray(V), 10)
    full = U @ V.T
    expect = np.argsort(-full, axis=1)[:, :10]
    np.testing.assert_array_equal(np.asarray(items), expect)
    np.testing.assert_allclose(np.asarray(scores),
                               np.take_along_axis(full, expect, 1), rtol=1e-5)


def test_topk_exclude(rng):
    U, V = _case(rng)
    exclude = np.array([[0, 1, -1], [5, -1, -1], [-1, -1, -1],
                        [2, 3, 4], [99, 98, 97]], np.int32)
    scores, items = topk_scores(jnp.asarray(U), jnp.asarray(V), 10,
                                jnp.asarray(exclude))
    for r in range(5):
        banned = set(e for e in exclude[r] if e >= 0)
        assert not (banned & set(np.asarray(items[r]).tolist()))


def test_sharded_topk_matches_single(rng, cpu_mesh):
    U, V = _case(rng, b=4, n=103, k=6)  # 103 not divisible by 8: padding path
    s1, i1 = topk_scores(jnp.asarray(U), jnp.asarray(V), 7)
    s2, i2 = sharded_topk(jnp.asarray(U), jnp.asarray(V), 7, cpu_mesh)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))


def test_chunked_exact_matches_naive(rng):
    # catalog wider than one exact block exercises the lax.scan merge path
    from recommendation_models_tpu.ops import topk as topk_mod
    U, V = _case(rng, b=6, n=40_000, k=8)
    sc, it = topk_mod._topk_exact_chunked(
        jnp.asarray(U), jnp.asarray(V), 10, block=4_096)
    full = U @ V.T
    expect = np.argsort(-full, axis=1)[:, :10]
    np.testing.assert_array_equal(np.asarray(it), expect)
    np.testing.assert_allclose(np.asarray(sc),
                               np.take_along_axis(full, expect, 1), rtol=1e-5)


def test_approx_method_on_cpu_matches_exact(rng):
    # CPU approx_max_k falls back to an exact sort: results must agree
    U, V = _case(rng, b=4, n=500, k=6)
    s_e, i_e = topk_scores(jnp.asarray(U), jnp.asarray(V), 5, method="exact")
    s_a, i_a = topk_scores(jnp.asarray(U), jnp.asarray(V), 5, method="approx")
    np.testing.assert_array_equal(np.asarray(i_e), np.asarray(i_a))


def test_exclude_overfetch_keeps_exactness(rng):
    # the top-k unseen must match a NumPy full-sort with seen items removed,
    # including a user whose seen list covers most of the catalog
    U, V = _case(rng, b=2, n=30, k=4)
    exclude = np.full((2, 25), -1, np.int32)
    exclude[0, :3] = [0, 1, 2]
    exclude[1] = np.arange(25)
    sc, it = topk_scores(jnp.asarray(U), jnp.asarray(V), 5,
                         jnp.asarray(exclude), method="exact")
    full = U @ V.T
    for r in range(2):
        banned = set(e for e in exclude[r] if e >= 0)
        order = [i for i in np.argsort(-full[r]) if i not in banned][:5]
        np.testing.assert_array_equal(np.asarray(it[r]), order)


def test_unknown_method_raises(rng):
    U, V = _case(rng)
    import pytest
    with pytest.raises(ValueError):
        topk_scores(jnp.asarray(U), jnp.asarray(V), 5, method="fastest")


def test_sharded_topk_exclude(rng, cpu_mesh):
    U, V = _case(rng, b=3, n=64, k=5)
    exclude = np.array([[0, 1], [10, 20], [-1, -1]], np.int32)
    s1, i1 = topk_scores(jnp.asarray(U), jnp.asarray(V), 6, jnp.asarray(exclude))
    s2, i2 = sharded_topk(jnp.asarray(U), jnp.asarray(V), 6, cpu_mesh,
                          exclude=jnp.asarray(exclude))
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))


def test_sharded_topk_small_catalog_wide_exclusion(rng, cpu_mesh):
    """Catalog so small that rows-per-shard < k: the per-shard fetch clamps
    to `per`, but the MERGE must still pool n_shards * per candidates wide
    enough to survive exclusion filtering (fuzz-found: the merged width was
    the per-shard clamp and the final top_k(k) raised)."""
    U, V = _case(rng, b=5, n=20, k=4)      # 20 items over 8 shards: per=3
    exclude = np.tile(np.arange(12, dtype=np.int32), (5, 1))
    s1, i1 = topk_scores(jnp.asarray(U), jnp.asarray(V), 4,
                         jnp.asarray(exclude))
    s2, i2 = sharded_topk(jnp.asarray(U), jnp.asarray(V), 4, cpu_mesh,
                          exclude=jnp.asarray(exclude))
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    # no excluded item served
    assert not (np.asarray(i2)[:, :, None] == exclude[:, None, :]).any()


def test_recommend_degree_bucketed_matches_bruteforce():
    # recommend() groups eval users by train degree (whales don't widen the
    # whole batch's overfetch) — results must still match per-user brute
    # force exclusion exactly.
    import scipy.sparse as sp
    from recommendation_models_tpu.models.als import ALS

    rng = np.random.default_rng(11)
    n_users, n_items = 60, 120
    rows, cols, vals = [], [], []
    for u in range(n_users):
        deg = 100 if u == 7 else int(rng.integers(1, 12))  # one whale
        its = rng.choice(n_items, deg, replace=False)
        rows += [u] * deg
        cols += list(its)
        vals += list(rng.uniform(1, 5, deg))
    R = sp.csr_matrix((vals, (rows, cols)), shape=(n_users, n_items))
    model = ALS(rank=6, n_sweeps=3, seed=0).fit(R)
    users = np.arange(n_users)
    sc, it = model.recommend(users, n=5, exclude_seen=True, method="exact")
    full = model.U_ @ model.V_.T
    for u in users:
        seen = set(R[int(u)].indices.tolist())
        order = [i for i in np.argsort(-full[u]) if i not in seen][:5]
        np.testing.assert_array_equal(it[u], order)
        assert not (seen & set(it[u].tolist()))


def test_k_out_of_range_raises_loudly():
    """r4 review: k > n_items silently returned (B, <k) on the sharded
    no-exclude path and raised obscurely elsewhere — both entries now
    validate."""
    import pytest
    from recommendation_models_tpu.ops.topk import sharded_topk, topk_scores
    from recommendation_models_tpu.parallel.mesh import get_mesh

    U = jnp.ones((3, 4), jnp.float32)
    V = jnp.ones((10, 4), jnp.float32)
    with pytest.raises(ValueError, match="k must be"):
        topk_scores(U, V, 11)
    with pytest.raises(ValueError, match="k must be"):
        sharded_topk(U, V, 11, get_mesh(8, platform="cpu"))
    with pytest.raises(ValueError, match="k must be"):
        topk_scores(U, V, 0)


def test_grouped_exclusion_all_zero_degree_users():
    """r4 review: an empty training index list (every requested user has
    degree 0) crashed with IndexError inside the exclusion gather."""
    from recommendation_models_tpu.ops.topk import (
        grouped_exclusion_topk, topk_scores)

    rng = np.random.default_rng(3)
    Uq = jnp.asarray(rng.standard_normal((4, 5)), jnp.float32)
    V = jnp.asarray(rng.standard_normal((30, 5)), jnp.float32)
    indptr = np.zeros(5, np.int64)            # all degrees zero
    indices = np.empty(0, np.int64)

    def query_rows(ids):
        return Uq[np.asarray(ids)]

    def topk(u, k, excl):
        return topk_scores(u, V, k, excl, method="exact")

    sc, it = grouped_exclusion_topk(np.arange(4), 6, indptr, indices,
                                    query_rows, topk)
    ref_s, ref_i = topk_scores(Uq, V, 6, None, method="exact")
    np.testing.assert_array_equal(it, np.asarray(ref_i))


def test_grouped_exclusion_widths_are_geometric_levels():
    """r4 review: exclusion width must be the geometric level, not the
    batch's data-dependent max degree (per-call recompiles otherwise)."""
    from recommendation_models_tpu.ops import topk as topk_mod

    rng = np.random.default_rng(5)
    n_users, n_items = 30, 64
    degs = rng.integers(1, 40, n_users)
    indptr = np.concatenate([[0], np.cumsum(degs)]).astype(np.int64)
    indices = rng.integers(0, n_items, int(degs.sum()))
    widths = []

    def query_rows(ids):
        return jnp.ones((len(ids), 4), jnp.float32)

    def topk(u, k, excl):
        widths.append(excl.shape[1])
        return (jnp.zeros((u.shape[0], k), jnp.float32),
                jnp.zeros((u.shape[0], k), jnp.int32))

    topk_mod.grouped_exclusion_topk(np.arange(n_users), 3, indptr, indices,
                                    query_rows, topk)
    assert set(widths) <= {32, 128, 512}      # levels only, never max-degree
