"""Gram accumulation + batched SPD solve vs dense NumPy (SURVEY.md §4.2-3/4)."""

import numpy as np
import jax.numpy as jnp
import pytest

from recommendation_models_tpu.ops.gram import gram_rhs, objective_weights
from recommendation_models_tpu.ops.solve import add_ridge, solve_spd


def _random_case(rng, b=6, p=20, n=30, k=5):
    V = rng.standard_normal((n, k)).astype(np.float32)
    idx = rng.integers(0, n, size=(b, p)).astype(np.int32)
    wg = (rng.random((b, p)) < 0.7).astype(np.float32)
    wr = wg * rng.uniform(1, 5, size=(b, p)).astype(np.float32)
    return V, idx, wg, wr


def _dense_gram(V, idx, wg, wr):
    b, p = idx.shape
    k = V.shape[1]
    G = np.zeros((b, k, k))
    rhs = np.zeros((b, k))
    for i in range(b):
        for j in range(p):
            v = V[idx[i, j]]
            G[i] += wg[i, j] * np.outer(v, v)
            rhs[i] += wr[i, j] * v
    return G, rhs


def test_gram_rhs_matches_dense(rng):
    V, idx, wg, wr = _random_case(rng)
    G, rhs = gram_rhs(jnp.asarray(V), jnp.asarray(idx), jnp.asarray(wg),
                      jnp.asarray(wr))
    Gd, rd = _dense_gram(V, idx, wg, wr)
    np.testing.assert_allclose(np.asarray(G), Gd, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(rhs), rd, rtol=1e-4, atol=1e-4)


def test_chunked_equals_unchunked(rng):
    V, idx, wg, wr = _random_case(rng, b=4, p=50)
    full = gram_rhs(jnp.asarray(V), jnp.asarray(idx), jnp.asarray(wg),
                    jnp.asarray(wr), chunk=64)
    chunked = gram_rhs(jnp.asarray(V), jnp.asarray(idx), jnp.asarray(wg),
                       jnp.asarray(wr), chunk=16)  # 50 -> 4 chunks w/ padding
    np.testing.assert_allclose(np.asarray(full[0]), np.asarray(chunked[0]),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(full[1]), np.asarray(chunked[1]),
                               rtol=1e-5, atol=1e-5)


def test_padding_contributes_exactly_zero(rng):
    """Property (SURVEY.md §4.2-4): mask-0 slots change nothing."""
    V, idx, wg, wr = _random_case(rng, b=3, p=10)
    idx2 = np.concatenate([idx, rng.integers(0, V.shape[0], (3, 6)).astype(np.int32)], 1)
    wg2 = np.concatenate([wg, np.zeros((3, 6), np.float32)], 1)
    wr2 = np.concatenate([wr, np.zeros((3, 6), np.float32)], 1)
    a = gram_rhs(jnp.asarray(V), jnp.asarray(idx), jnp.asarray(wg), jnp.asarray(wr))
    b = gram_rhs(jnp.asarray(V), jnp.asarray(idx2), jnp.asarray(wg2), jnp.asarray(wr2))
    np.testing.assert_allclose(np.asarray(a[0]), np.asarray(b[0]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(a[1]), np.asarray(b[1]), atol=1e-6)


@pytest.mark.parametrize("solver", ["xla", "lu"])
def test_solve_spd_matches_numpy(rng, solver):
    b, k = 8, 6
    A = rng.standard_normal((b, k, k))
    G = np.einsum("bij,bkj->bik", A, A) + 0.5 * np.eye(k)
    rhs = rng.standard_normal((b, k))
    x = solve_spd(jnp.asarray(G, jnp.float32), jnp.asarray(rhs, jnp.float32),
                  solver=solver)
    expected = np.linalg.solve(G, rhs[..., None])[..., 0]
    np.testing.assert_allclose(np.asarray(x), expected, rtol=1e-3, atol=1e-3)


def test_add_ridge_by_degree():
    G = jnp.zeros((2, 3, 3))
    deg = jnp.asarray([2.0, 5.0])
    out = np.asarray(add_ridge(G, 0.1, deg))
    np.testing.assert_allclose(out[0], 0.2 * np.eye(3), atol=1e-6)
    np.testing.assert_allclose(out[1], 0.5 * np.eye(3), atol=1e-6)


def test_objective_weights_explicit_vs_implicit():
    vals = jnp.asarray([[1.0, 4.0, 0.0]])
    mask = jnp.asarray([[1.0, 1.0, 0.0]])
    wg, wr = objective_weights(vals, mask, None)
    np.testing.assert_allclose(np.asarray(wg), [[1, 1, 0]])
    np.testing.assert_allclose(np.asarray(wr), [[1, 4, 0]])
    wg, wr = objective_weights(vals, mask, 2.0)
    np.testing.assert_allclose(np.asarray(wg), [[2, 8, 0]])   # alpha*r
    np.testing.assert_allclose(np.asarray(wr), [[3, 9, 0]])   # 1+alpha*r


def test_half_sweep_fused_sse_matches_masked_sse(rng):
    """The solve-derived SSE (free from the item half-sweep) must equal the
    explicit gather-based masked_sse at (U_new, V_new)."""
    import jax.numpy as jnp
    from recommendation_models_tpu.config import SolveConfig
    from recommendation_models_tpu.data.layout import layout_from_coo
    from recommendation_models_tpu.solver.als_sweep import (
        device_buckets, half_sweep, masked_sse)

    n_users, n_items, k = 40, 30, 6
    n_obs = 300
    users = rng.integers(0, n_users, n_obs)
    items = rng.integers(0, n_items, n_obs)
    # dedup (u, i) pairs to keep CSR well-formed
    uniq = np.unique(users * n_items + items)
    users, items = uniq // n_items, uniq % n_items
    vals = rng.uniform(1, 5, uniq.shape[0]).astype(np.float32)
    ul = layout_from_coo(users, items, vals, n_users, n_items)
    il = layout_from_coo(users, items, vals, n_users, n_items, transpose=True)
    ub, ib = device_buckets(ul), device_buckets(il)
    cfg = SolveConfig(rank=k, reg=0.05, solver="xla")

    U = jnp.asarray(0.1 * rng.standard_normal((n_users, k)), jnp.float32)
    U2 = half_sweep(jnp.asarray(0.1 * rng.standard_normal((n_items, k)),
                                jnp.float32), ub, n_users, cfg)
    V2, sse_fused = half_sweep(U2, ib, n_items, cfg, with_sse=True)
    sse_ref = masked_sse(U2, V2, ub)
    np.testing.assert_allclose(float(sse_fused), float(sse_ref),
                               rtol=1e-3, atol=1e-2)


def test_dense_whale_fused_sse_and_full_fit(rng):
    """Fused SSE and the scanned full fit must stay exact when rows ride the
    dense-whale block (both explicit and implicit objectives)."""
    import jax.numpy as jnp
    import scipy.sparse as sp
    from recommendation_models_tpu.config import DataConfig, SolveConfig
    from recommendation_models_tpu.data.layout import layout_from_coo
    from recommendation_models_tpu.models.als import ALS
    from recommendation_models_tpu.solver.als_sweep import (
        device_buckets, half_sweep, masked_sse)

    n_users, n_items, k = 30, 60, 5
    # users 0-2 are whales rating 50 items each; rest rate ~5
    rows = np.concatenate([np.repeat(np.arange(3), 50),
                           np.repeat(np.arange(3, n_users), 5)])
    cols = np.concatenate([np.tile(np.arange(50), 3),
                           rng.integers(0, n_items, 5 * (n_users - 3))])
    uniq = np.unique(rows * n_items + cols)
    rows, cols = uniq // n_items, uniq % n_items
    vals = rng.uniform(1, 5, uniq.shape[0]).astype(np.float32)
    dcfg = DataConfig(max_bucket=16)
    ul = layout_from_coo(rows, cols, vals, n_users, n_items, config=dcfg)
    il = layout_from_coo(rows, cols, vals, n_users, n_items, transpose=True,
                         config=dcfg)
    assert ul.dense_ids is not None and len(ul.dense_ids) >= 3
    ub, ib = device_buckets(ul), device_buckets(il)
    cfg = SolveConfig(rank=k, reg=0.05, solver="xla")
    U2 = half_sweep(jnp.asarray(0.1 * rng.standard_normal((n_items, k)),
                                jnp.float32), ub, n_users, cfg)
    V2, sse_fused = half_sweep(U2, ib, n_items, cfg, with_sse=True)
    sse_ref = masked_sse(U2, V2, ub)
    np.testing.assert_allclose(float(sse_fused), float(sse_ref),
                               rtol=1e-3, atol=1e-2)

    # full fits converge on both objectives with whales in the dense block
    R = sp.csr_matrix((vals, (rows, cols)), shape=(n_users, n_items))
    for alpha in (None, 10.0):
        m = ALS(rank=k, reg=0.05, alpha=alpha, n_sweeps=4, seed=0,
                max_bucket=16, solver="xla", platform="cpu").fit(R)
        assert m.history_[-1] < m.history_[0]
        assert np.isfinite(m.history_).all()


@pytest.mark.parametrize("dense_whales", [True, False])
def test_whale_half_sweep_matches_dense(rng, dense_whales):
    """A whale row (degree > max_bucket) must solve to exactly the same
    normal-equations solution as the dense computation — on BOTH whale
    paths: the dense gramian block and the wide chunk-scanned bucket."""
    import jax.numpy as jnp
    from recommendation_models_tpu.config import DataConfig, SolveConfig
    from recommendation_models_tpu.data.layout import layout_from_coo
    from recommendation_models_tpu.solver.als_sweep import (
        device_buckets, half_sweep)

    n_users, n_items, k = 5, 200, 6
    # user 0 is a whale: rates 150 items; others rate a few
    rows = np.concatenate([np.zeros(150, np.int64),
                           np.repeat(np.arange(1, n_users), 4)])
    cols = np.concatenate([np.arange(150),
                           rng.integers(150, n_items, 4 * (n_users - 1))])
    vals = rng.uniform(1, 5, rows.shape[0]).astype(np.float32)
    layout = layout_from_coo(
        rows, cols, vals, n_users, n_items,
        config=DataConfig(max_bucket=32, dense_whales=dense_whales))
    if dense_whales:
        np.testing.assert_array_equal(layout.dense_ids, [0])
    else:
        whale_pad = max(b.pad for b in layout.buckets)
        assert whale_pad >= 150 and whale_pad % 32 == 0
    V = jnp.asarray(rng.standard_normal((n_items, k)), jnp.float32)
    cfg = SolveConfig(rank=k, reg=0.1, solver="xla",
                      compute_dtype="float32")
    U = np.asarray(half_sweep(V, device_buckets(layout), n_users, cfg))

    Vh = np.asarray(V, np.float64)
    for u in range(n_users):
        idx = cols[rows == u]
        r = vals[rows == u].astype(np.float64)
        G = Vh[idx].T @ Vh[idx] + 0.1 * np.eye(k)
        x = np.linalg.solve(G, Vh[idx].T @ r)
        np.testing.assert_allclose(U[u], x, rtol=2e-4, atol=2e-4)


def test_row_blocked_accumulation_matches_unblocked(rng):
    """The gather-budget row-block scan must produce identical normal
    equations to the single-shot path (exercises the big-bucket branch that
    only triggers at scale otherwise)."""
    import dataclasses
    import jax.numpy as jnp
    from recommendation_models_tpu.config import SolveConfig
    from recommendation_models_tpu.data.layout import layout_from_coo
    from recommendation_models_tpu.solver.als_sweep import (
        device_buckets, half_sweep)

    n_users, n_items, k = 64, 50, 5
    rows = np.repeat(np.arange(n_users), 12)
    cols = rng.integers(0, n_items, rows.shape[0]).astype(np.int64)
    # dedup per row
    keep = np.ones(rows.shape[0], bool)
    seen = set()
    for i, (r, c) in enumerate(zip(rows, cols)):
        keep[i] = (r, c) not in seen
        seen.add((r, c))
    rows, cols = rows[keep], cols[keep]
    vals = rng.uniform(1, 5, rows.shape[0]).astype(np.float32)
    layout = layout_from_coo(rows, cols, vals, n_users, n_items)
    ub = device_buckets(layout)
    V = jnp.asarray(rng.standard_normal((n_items, k)), jnp.float32)
    big = SolveConfig(rank=k, reg=0.1, solver="xla", compute_dtype="float32",
                      gather_budget_mb=1024)      # every bucket one block
    # a 1 MB budget forces small row blocks -> the scan branch runs
    tiny = dataclasses.replace(big, gather_budget_mb=1)
    np.testing.assert_allclose(
        np.asarray(half_sweep(V, ub, n_users, big)),
        np.asarray(half_sweep(V, ub, n_users, tiny)),
        rtol=1e-5, atol=1e-5)


def test_gather_budget_auto_policy_pins():
    """The measured auto gather-budget policy (config.py docstring ledger;
    r5 re-tuned the k>64 large-nnz point 256 -> 1536 MB, a -33% epoch at
    synth100m rank-128). Any change here must come with new whole-epoch
    measurements."""
    from recommendation_models_tpu.config import gather_budget_for_rank
    assert gather_budget_for_rank(64) == 2
    assert gather_budget_for_rank(64, 100_000_000) == 2
    assert gather_budget_for_rank(128) == 4096          # ML-25M class
    assert gather_budget_for_rank(128, 19_027_200) == 4096
    assert gather_budget_for_rank(128, 77_037_080) == 1536   # 100M class


def test_sse_mode_policy_pins():
    """config.sse_separate_for — the r5 riding-vs-separate A/B table (see
    SolveConfig.sse_mode). Only the ML-25M-rank-64 class takes the
    separate pass; implicit always does (no riding identity exists)."""
    import dataclasses
    from recommendation_models_tpu.config import (
        SolveConfig, sse_separate_for)
    c64 = SolveConfig(rank=64)
    assert sse_separate_for(c64, 19_027_200)          # ml25m r64
    assert not sse_separate_for(c64, 646_100)         # ml1m
    assert not sse_separate_for(c64, 77_037_080)      # synth100m
    assert not sse_separate_for(c64, None)            # unknown size
    assert not sse_separate_for(SolveConfig(rank=128), 19_027_200)
    # implicit: always the direct pass, regardless of mode
    ci = SolveConfig(rank=64, alpha=40.0, sse_mode="riding")
    assert sse_separate_for(ci, 646_100)
    # explicit override
    assert sse_separate_for(
        dataclasses.replace(c64, sse_mode="separate"), 100)
    assert not sse_separate_for(
        dataclasses.replace(c64, sse_mode="riding"), 19_027_200)
    import pytest
    with pytest.raises(ValueError):
        sse_separate_for(dataclasses.replace(c64, sse_mode="bogus"), 1)


def test_scanned_fit_sse_modes_agree(rng):
    """Riding identity and separate masked_sse produce the same history
    (the identity equals masked_sse(U_new, V_new) — the r5 A/B is purely
    a performance choice)."""
    import jax.numpy as jnp
    from recommendation_models_tpu.config import SolveConfig
    from recommendation_models_tpu.data.layout import layout_from_coo
    from recommendation_models_tpu.solver.als_sweep import (
        device_buckets, make_scanned_fit)
    n_users, n_items, k = 40, 30, 4
    rows = rng.integers(0, n_users, 400)
    cols = rng.integers(0, n_items, 400)
    keep = np.unique(rows * n_items + cols, return_index=True)[1]
    rows, cols = rows[keep], cols[keep]
    vals = rng.uniform(1, 5, rows.shape[0]).astype(np.float32)
    ub = device_buckets(layout_from_coo(rows, cols, vals, n_users, n_items))
    ib = device_buckets(layout_from_coo(rows, cols, vals, n_users, n_items,
                                        transpose=True))
    U0 = 0.1 * rng.standard_normal((n_users, k)).astype(np.float32)
    V0 = 0.1 * rng.standard_normal((n_items, k)).astype(np.float32)
    hists = {}
    for mode in ("riding", "separate"):
        cfg = SolveConfig(rank=k, reg=0.1, solver="xla",
                          compute_dtype="float32", sse_mode=mode)
        fit = make_scanned_fit(ub, ib, n_users, n_items, cfg, 3)
        *_, hist, n_done = fit(jnp.asarray(U0), jnp.asarray(V0))
        hists[mode] = np.asarray(hist)
    np.testing.assert_allclose(hists["riding"], hists["separate"],
                               rtol=1e-4, atol=1e-4)


def test_solve_spd_t_large_rank_falls_back(rng):
    """k > 160 with a multi-block batch is outside the Mosaic lane limit:
    solve_spd_t must route to the XLA anchor (same answers)."""
    import jax.numpy as jnp
    from recommendation_models_tpu.ops.pallas.cholesky import (
        block_batch, pallas_supported)
    from recommendation_models_tpu.ops.solve import solve_spd_t

    k = 192
    b = block_batch(k) + 8          # forces a multi-block grid
    assert not pallas_supported(k, b)
    A = rng.standard_normal((b, k, k)).astype(np.float32) / np.sqrt(k)
    G = np.einsum("bij,bkj->bik", A, A) + 0.5 * np.eye(k, dtype=np.float32)
    rhs = rng.standard_normal((b, k)).astype(np.float32)
    x = np.asarray(solve_spd_t(jnp.asarray(G.transpose(1, 2, 0)),
                               jnp.asarray(rhs.T), "pallas")).T
    ref = np.stack([np.linalg.solve(G[i], rhs[i]) for i in range(b)])
    scale = max(np.abs(ref).max(), 1.0)
    np.testing.assert_allclose(x, ref, atol=5e-4 * scale, rtol=5e-4)


def test_pallas_supported_guards():
    """The support predicate must model the actual compiled grids:
    the 2-operand (Gt2) path halves the batch block, and block_batch's
    8-wide floor at extreme k blows the VMEM budget (ADVICE round 2)."""
    from recommendation_models_tpu.ops.pallas.cholesky import (
        block_batch, pallas_supported)

    # full-lane blocks: multi-block grids fine at any batch
    assert pallas_supported(64, 100_000)
    assert pallas_supported(160, 100_000)
    assert pallas_supported(192, block_batch(192))
    assert not pallas_supported(192, block_batch(192) + 8)
    # 2-operand path halves the block. At k<=160 the halved block is still
    # >= 128 lanes (block_batch 256) -> multi-block stays legal; at k>160
    # the halved sub-128-lane block must span the whole batch.
    assert pallas_supported(64, 100_000, two_operand=True)   # 256//2=128 ok
    assert pallas_supported(128, 100_000, two_operand=True)  # 256//2=128 ok
    halved192 = max(block_batch(192) // 2 // 8 * 8, 8)   # 8-aligned halving
    assert pallas_supported(192, halved192, two_operand=True)
    assert not pallas_supported(192, halved192 + 8, two_operand=True)
    # extreme k: the 8-wide floor exceeds the ~40 MB VMEM target -> False
    # even for tiny batches (route to XLA instead of a Mosaic blowup)
    assert not pallas_supported(1048, 8)
    assert not pallas_supported(2048, 8)


def test_solve_spd_t_two_operand_partial_block(rng):
    """b between one and two HALVED blocks (non-multiple): the 2-operand
    path must pad to the effective (halved) block, or the kernel grid
    floors b//bt and systems past the first block return uninitialized
    memory (round-3 review finding; k=8 -> block 512, halved 256)."""
    import jax.numpy as jnp
    from recommendation_models_tpu.ops.solve import solve_spd_t

    k, b = 8, 300                      # 256 < 300 < 512, not a multiple
    A = rng.standard_normal((b, k, k)).astype(np.float32) / np.sqrt(k)
    G1 = np.einsum("bij,bkj->bik", A, A) + 0.3 * np.eye(k, dtype=np.float32)
    B2 = rng.standard_normal((b, k, k)).astype(np.float32) / np.sqrt(k)
    G2 = np.einsum("bij,bkj->bik", B2, B2) + 0.3 * np.eye(k, dtype=np.float32)
    rhs = rng.standard_normal((b, k)).astype(np.float32)
    x = np.asarray(solve_spd_t(jnp.asarray(G1.transpose(1, 2, 0)),
                               jnp.asarray(rhs.T), "pallas",
                               Gt2=jnp.asarray(G2.transpose(1, 2, 0)))).T
    ref = np.stack([np.linalg.solve(G1[i] + G2[i], rhs[i]) for i in range(b)])
    scale = max(np.abs(ref).max(), 1.0)
    np.testing.assert_allclose(x, ref, atol=5e-4 * scale, rtol=5e-4)


def test_solve_spd_t_two_operand_multiblock_falls_back(rng):
    """A k=192 Gt2 solve with b > halved-block must take the XLA fallback
    (the halved sub-128-lane block would compile an illegal multi-block
    Mosaic grid) and still return correct answers. (At k<=160 the halved
    block stays 128-lane-wide, so the 2-operand multi-block case is legal
    there — see pallas_supported.)"""
    import jax.numpy as jnp
    from recommendation_models_tpu.ops.pallas.cholesky import block_batch
    from recommendation_models_tpu.ops.solve import solve_spd_t

    k = 192
    b = block_batch(k)           # > halved block -> fallback
    A = rng.standard_normal((b, k, k)).astype(np.float32) / np.sqrt(k)
    G1 = np.einsum("bij,bkj->bik", A, A) + 0.3 * np.eye(k, dtype=np.float32)
    B2 = rng.standard_normal((b, k, k)).astype(np.float32) / np.sqrt(k)
    G2 = np.einsum("bij,bkj->bik", B2, B2) + 0.3 * np.eye(k, dtype=np.float32)
    rhs = rng.standard_normal((b, k)).astype(np.float32)
    x = np.asarray(solve_spd_t(jnp.asarray(G1.transpose(1, 2, 0)),
                               jnp.asarray(rhs.T), "pallas",
                               Gt2=jnp.asarray(G2.transpose(1, 2, 0)))).T
    ref = np.stack([np.linalg.solve(G1[i] + G2[i], rhs[i]) for i in range(b)])
    scale = max(np.abs(ref).max(), 1.0)
    np.testing.assert_allclose(x, ref, atol=5e-4 * scale, rtol=5e-4)


def test_solve_spd_shape_normalization_and_empty():
    """r4 review: 2-D and 4-D G crashed the pallas branch and skipped the
    TPU chunking; empty batches crashed with ZeroDivisionError."""
    import jax.numpy as jnp
    from recommendation_models_tpu.ops.solve import (
        solve_spd, solve_spd_flat, solve_spd_t)

    rng = np.random.default_rng(17)
    k = 8
    A = rng.standard_normal((k, 2 * k)).astype(np.float32)
    G2 = A @ A.T + 0.5 * np.eye(k, dtype=np.float32)     # one SPD system
    r2 = rng.standard_normal(k).astype(np.float32)
    ref = np.linalg.solve(G2, r2)
    for solver in ("xla", "pallas", "lu"):
        x = solve_spd(jnp.asarray(G2), jnp.asarray(r2), solver)   # 2-D
        np.testing.assert_allclose(np.asarray(x), ref, rtol=2e-4, atol=2e-5)
    G4 = np.broadcast_to(G2, (2, 3, k, k))
    r4 = np.broadcast_to(r2, (2, 3, k))
    x4 = solve_spd(jnp.asarray(G4), jnp.asarray(r4), "pallas")
    assert x4.shape == (2, 3, k)
    np.testing.assert_allclose(np.asarray(x4)[1, 2], ref, rtol=2e-4,
                               atol=2e-5)
    # empty batches return clean empties on every path
    for solver in ("xla", "pallas"):
        assert solve_spd(jnp.zeros((0, k, k)), jnp.zeros((0, k)),
                         solver).shape == (0, k)
        assert solve_spd_t(jnp.zeros((k, k, 0)), jnp.zeros((k, 0)),
                           solver).shape == (k, 0)
        assert solve_spd_flat(jnp.zeros((0, k * k)), jnp.zeros((0, k)), k,
                              solver).shape == (0, k)


def test_kernel_entries_guard_bad_batches():
    """r4 review: non-multiple batches raised as uninitialized-memory
    garbage; empty batches ZeroDivisionError'd."""
    import jax.numpy as jnp
    import pytest
    from recommendation_models_tpu.ops.pallas.cholesky import (
        _cholesky_solve_t, cholesky_solve, cholesky_solve_flat)

    k = 8
    assert cholesky_solve(jnp.zeros((0, k, k)), jnp.zeros((0, k))
                          ).shape == (0, k)
    assert cholesky_solve_flat(jnp.zeros((0, k * k)), jnp.zeros((0, k)), k
                               ).shape == (0, k)
    with pytest.raises(ValueError, match="multiple of the block"):
        # k=64 => block 256; b=300 > block and not a multiple
        _cholesky_solve_t(jnp.zeros((64, 64, 300)), jnp.zeros((64, 300)),
                          jnp.zeros((1, 300)), interpret=True)
