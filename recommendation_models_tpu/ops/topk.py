"""Top-k dot-product candidate retrieval (SURVEY.md N9; reference §2.1 row 9).

The reference's `top_n` is `argsort(U[u] @ V.T)[:N]` on one CPU. Here the
scoring matmul rides the MXU and the selection is TPU-shaped:

- ``method='approx'`` — `jax.lax.approx_max_k`, XLA's PartialReduce-based
  MIPS retrieval op. XLA fuses it with the f32 scoring einsum so the (B, n)
  score matrix is never materialized in HBM. ~250x faster than naive
  `lax.top_k` at ML-25M catalog size (measured: 4.8 ms vs 1337 ms for
  8192 users x 62k items) at recall_target=0.95+.
- ``method='exact'`` — for large catalogs, a `lax.scan` over item blocks
  with a running top-k merge (the full sort-based `lax.top_k` over a wide
  row is VPU-sort-bound; blocking is ~16x faster and HBM-bounded).
- ``method='auto'`` — approx on TPU for large catalogs, exact otherwise
  (CPU `approx_max_k` falls back to exact sort anyway).

Exclusion of seen items is done by overfetching ``k + E`` candidates and
filtering, never by scattering -inf into the materialized score matrix:
the top-k unseen items are always contained in the top ``k + E`` overall.

Measured (v5e, 62k catalog, rank 64, 32k query batches): the fused scoring
matmul alone ceilings at ~8.7M users/s (K=64-deep contraction), and
approx_max_k reaches ~8.0M at recall_target 0.95 (0.983 empirical recall
vs exact top-10) vs ~4.7M at the default 0.99 (0.996 empirical). The
``recall_target`` kwarg is the speed/quality dial; exact ``lax.top_k`` on
the full row is ~250x slower.

The sharded path (shard_map over the item axis) computes per-shard
top-k candidates, all_gathers the (n_shards * k) survivors, and merges —
the heavy matmul rides the item shards and cross-shard traffic stays
O(B * k * n_shards).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

# Item-axis block size for the chunked exact scan: big enough to keep the
# per-block matmul MXU-shaped, small enough that lax.top_k's sort stays cheap.
_EXACT_BLOCK = 16_384
# Below this catalog size a single fused matmul+top_k is fine.
_SMALL_N = 8_192


def _resolve_method(method: str, n_items: int, k: int) -> str:
    if method not in ("auto", "exact", "approx"):
        raise ValueError(f"unknown top-k method {method!r}")
    if method != "auto":
        return method
    if n_items <= _SMALL_N or k * 4 >= n_items:
        return "exact"
    try:
        platform = jax.default_backend()
    except RuntimeError:  # pragma: no cover - no backend at all
        platform = "cpu"
    return "approx" if platform == "tpu" else "exact"


def _scores(u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    # f32 einsum: XLA fuses this with approx_max_k's PartialReduce. (A bf16
    # cast here BREAKS that fusion and forces the full (B, n) matrix to HBM
    # — measured 200x slower — so scoring stays f32.)
    return jnp.einsum("bk,nk->bn", u, v, preferred_element_type=jnp.float32)


def _topk_exact_small(u, v, k):
    return jax.lax.top_k(_scores(u, v), k)


def _topk_exact_chunked(u, v, k, block=_EXACT_BLOCK, n_valid=None):
    """Exact top-k via lax.scan over item blocks with a running merge.

    ``n_valid``: true candidate-row bound (may be a traced value — sharded
    callers mask a shard-relative tail); defaults to v's row count.
    """
    n, d = v.shape
    b = u.shape[0]
    if n_valid is None:
        n_valid = n
    pad = (-n) % block
    vp = jnp.pad(v, ((0, pad), (0, 0)))
    v_blocks = vp.reshape(-1, block, d)
    bases = jnp.arange(v_blocks.shape[0], dtype=jnp.int32) * block

    kb = min(k, block)  # a block holds only `block` candidates: taking all
    # of them keeps the running merge exact even when k > block

    def body(carry, xs):
        c_sc, c_ix = carry
        v_blk, base = xs
        s = _scores(u, v_blk)
        ids = base + jnp.arange(block, dtype=jnp.int32)
        s = jnp.where(ids[None, :] < n_valid, s, -jnp.inf)
        sc, ix = jax.lax.top_k(s, kb)
        ix = ix + base
        m_sc = jnp.concatenate([c_sc, sc], axis=1)
        m_ix = jnp.concatenate([c_ix, ix], axis=1)
        sc2, pos = jax.lax.top_k(m_sc, k)
        return (sc2, jnp.take_along_axis(m_ix, pos, axis=1)), None

    init = (jnp.full((b, k), -jnp.inf, jnp.float32),
            jnp.zeros((b, k), jnp.int32))
    (sc, ix), _ = jax.lax.scan(body, init, (v_blocks, bases))
    return sc, ix


def _filter_seen(sc, ix, exclude, k):
    """Drop excluded candidates and re-select top-k (the ONE shared
    overfetch-filter-merge; inside jit the (B, overfetch, E) compare fuses
    into the any-reduce — eager it materialized tens of GB at ML-25M
    exclusion widths, r4 review)."""
    seen = (ix[:, :, None] == exclude[:, None, :]).any(-1)
    sc = jnp.where(seen, -jnp.inf, sc)
    sc_k, pos = jax.lax.top_k(sc, k)
    return sc_k, jnp.take_along_axis(ix, pos, axis=1)


def _topk_unseen(u, v, k, method, recall_target,
                 exclude: Optional[jnp.ndarray]) -> Tuple[jnp.ndarray, jnp.ndarray]:
    n_items = v.shape[0]
    overfetch = k if exclude is None else min(k + exclude.shape[1], n_items)
    if method == "approx":
        sc, ix = jax.lax.approx_max_k(_scores(u, v), overfetch,
                                      recall_target=recall_target)
    elif n_items <= _SMALL_N:
        sc, ix = _topk_exact_small(u, v, overfetch)
    else:
        sc, ix = _topk_exact_chunked(u, v, overfetch)
    if exclude is None:
        return sc, ix
    return _filter_seen(sc, ix, exclude, k)


# Serving calls these EAGERLY from recommend(): without jit the scoring
# einsum, approx_max_k and the seen-mask dispatch as separate XLA ops —
# the (B, n) score matrix AND the (B, overfetch, E) seen mask materialize
# in HBM (the latter OOMs at ML-25M exclusion widths), and none of the
# fusion the module docstring (and the measured ~5M users/s) relies on
# happens. Module-level jitted entry points with static selection params
# give every recommend() call the fused program from a stable jit cache.
@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def _topk_jit_nox(u, v, k, method, recall_target):
    return _topk_unseen(u, v, k, method, recall_target, None)


@functools.partial(jax.jit, static_argnums=(3, 4, 5))
def _topk_jit_ex(u, v, exclude, k, method, recall_target):
    return _topk_unseen(u, v, k, method, recall_target, exclude)


def topk_scores(
    U_rows: jnp.ndarray,          # (B, k) query user factors
    V: jnp.ndarray,               # (n_items, k) item factors
    k: int,
    exclude: Optional[jnp.ndarray] = None,   # (B, E) int32 seen items, -1 = none
    method: str = "auto",
    recall_target: float = 0.99,
):
    """Returns (scores (B, k), items (B, k)) of the top-k items.

    ``exclude`` rows may be padded with -1 (no item has id -1, so padding
    never matches a candidate). Runs as ONE jitted fused program per
    (shape, k, method) — see _topk_jit_* above.

    NOTE on 'exact': selection is exact over the computed scores, but on
    TPU the f32 scoring dot at DEFAULT precision is a one-pass bf16
    contraction (CLAUDE.md) — near-ties (< bf16 input rounding apart) may
    order differently than a f64 host reference.
    """
    if k < 1 or k > V.shape[0]:
        raise ValueError(
            f"k must be in [1, n_items={V.shape[0]}], got {k} — a short "
            "(B, <k) result would break shape-(B, k) consumers silently")
    method = _resolve_method(method, V.shape[0], k)
    if exclude is None:
        return _topk_jit_nox(U_rows, V, k, method, recall_target)
    return _topk_jit_ex(U_rows, V, jnp.asarray(exclude), k, method,
                        recall_target)


_PERM_SEED = 0x5EED


def serving_permutation(n_items: int, seed: int = _PERM_SEED):
    """Fixed random catalog permutation for approx serving (r5 ledger).

    ``approx_max_k``'s recall_target guarantee assumes the true top-k are
    UNIFORMLY ARRANGED along the reduced axis. Recommendation catalogs
    violate it structurally: item ids correlate with popularity (MovieLens
    ids are roughly chronological; the synthetic Zipf catalog is sorted),
    so top-scoring candidates cluster into contiguous PartialReduce bins
    and co-located winners are dropped. Measured on the ml25m serving
    config (v5e, BASELINE.md r5): at recall_target=0.99 the id-ordered
    catalog realizes 0.42-0.70 SET-recall at exclusion overfetch widths
    42-138 (the jitted/fused einsum+PartialReduce form is far worse than
    the eager unfused form, which is why this shipped silently in r4:
    recall@10 0.134 -> 0.1198), while serving the same scores through this
    permutation restores exact-selection quality (0.13385 = the exact
    path) at approx speed.

    Returns ``(perm_back, perm_fwd)``: serving row ``j`` holds item
    ``perm_back[j]``; item ``i`` lives at serving row ``perm_fwd[i]``.
    Deterministic in ``n_items`` so results are reproducible across
    processes and pickling round-trips.
    """
    rng = np.random.default_rng(seed + n_items)
    perm_back = rng.permutation(n_items).astype(np.int64)
    perm_fwd = np.empty_like(perm_back)
    perm_fwd[perm_back] = np.arange(n_items, dtype=np.int64)
    return perm_back, perm_fwd


def permuted_topk(topk, perm_back, perm_fwd):
    """Wrap a ``(Uq, k, excl) -> (sc, it)`` serving backend whose catalog
    rows are in ``perm_back`` order: exclusion ids map forward (-1 padding
    preserved — no item has id -1), returned item ids map back to catalog
    order. Host-side index maps only; the device program is untouched."""
    def wrapped(Uq, k, excl):
        if excl is not None:
            e = np.asarray(excl)
            excl = jnp.asarray(
                np.where(e >= 0, perm_fwd[np.maximum(e, 0)], -1
                         ).astype(np.int32))
        sc, it = topk(Uq, k, excl)
        return np.asarray(sc), perm_back[np.asarray(it)]
    return wrapped


def grouped_exclusion_topk(user_ids, n, indptr, indices, query_rows, topk,
                           query_chunk: int = 16_384):
    """Degree-bucketed exclude-seen serving (host orchestration, shared by
    the ALS and IMC `recommend` paths).

    Exclusion overfetch is n + the batch's max train degree, so one whale
    user (ML-25M degree 10^4+) would drag EVERY row's approx_max_k to
    near-catalog width. Sort users by degree, cut at geometric width
    levels, and give each group its own exclusion width + top-k call. Host
    prep is all vectorized; queries are chunked so the exact (CPU) path's
    materialized score blocks stay bounded.

    ``query_rows(ids) -> (B, k)`` and ``topk(Uq, n, excl) -> (sc, it)`` are
    backend callables (single-device or sharded). Returns NumPy
    (scores (B, n), items (B, n)) aligned with ``user_ids``.
    """
    user_ids = np.atleast_1d(np.asarray(user_ids, np.int64))
    indptr = np.asarray(indptr, np.int64)
    indices = np.asarray(indices)
    degs = indptr[user_ids + 1] - indptr[user_ids]
    order = np.argsort(degs, kind="stable")
    sd = degs[order]
    batch = user_ids.shape[0]
    out_s = np.empty((batch, n), np.float32)
    out_i = np.empty((batch, n), np.int64)

    levels, w = [], 32
    maxd = int(sd[-1]) if batch else 0
    while True:
        levels.append(w)
        if w >= maxd:
            break
        w *= 4
    cuts = np.searchsorted(sd, np.asarray(levels), side="right")
    start = 0
    for level, cut in zip(levels, cuts):
        if cut <= start:
            continue
        grp = order[start:cut]
        # exclusion width = the geometric LEVEL, not the group's max
        # degree: a data-dependent width gave nearly every serving batch
        # fresh XLA shapes (per-call recompiles — r4 review); the level
        # caps distinct widths at ~log4(max degree) at the cost of a few
        # extra -1 padding slots
        width = level          # every member's degree <= its level by the
        start = cut            # searchsorted cut (<= 4x padding worst-case)
        lo = indptr[user_ids[grp]]
        gdeg = degs[grp]
        cols = np.arange(width, dtype=np.int64)[None, :]
        valid = cols < gdeg[:, None]
        pos = np.where(valid, lo[:, None] + cols, 0)
        # indices may be EMPTY (every requested user has zero training
        # degree): valid is all-False then, but fancy-indexing an empty
        # array still raises — substitute zeros (masked to -1 anyway)
        gathered = indices[pos] if indices.size else np.zeros_like(pos)
        excl = np.where(valid, gathered, -1).astype(np.int32)
        for q in range(0, grp.shape[0], query_chunk):
            sl = slice(q, q + query_chunk)
            # pass the HOST block: the serving-permutation wrapper maps
            # exclusion ids on host (permuted_topk), and every backend
            # jnp.asarray's its exclude anyway — uploading here would
            # round-trip whale-group blocks device->host->device (r5)
            sc, it = topk(query_rows(user_ids[grp[sl]]), n, excl[sl])
            out_s[grp[sl]] = np.asarray(sc)
            out_i[grp[sl]] = np.asarray(it)
    return out_s, out_i


def sharded_topk(
    U_rows: jnp.ndarray,
    V: jnp.ndarray,
    k: int,
    mesh: Mesh,
    axis: str = "data",
    exclude: Optional[jnp.ndarray] = None,
    method: str = "auto",
    recall_target: float = 0.99,
    n_valid: Optional[int] = None,
):
    """Top-k with V row-sharded over `axis`; queries replicated.

    Per-shard top-k keeps the cross-shard traffic at O(B * k * n_shards)
    instead of O(B * n_items). ``n_valid`` marks the true item count when V
    arrives already padded to shard multiples (e.g. a sharded fit's
    device-resident table): rows >= n_valid are masked out of candidacy
    (they are zero vectors, which would otherwise outrank negative scores).
    """
    n_shards = mesh.shape[axis]
    n_items = n_valid if n_valid is not None else V.shape[0]
    if k < 1 or k > n_items:
        raise ValueError(
            f"k must be in [1, n_items={n_items}], got {k} — the no-"
            "exclude path would silently return fewer than k columns")
    per = -(-V.shape[0] // n_shards)
    if per * n_shards != V.shape[0]:
        V = jnp.pad(V, ((0, per * n_shards - V.shape[0]), (0, 0)))
    want = k if exclude is None else min(k + exclude.shape[1], n_items)
    # a shard holds only `per` candidates, but the MERGE pools n_shards of
    # those — its width must stay `want`, not the per-shard clamp (with a
    # small catalog over many shards, per < k made the final top_k fail;
    # fuzz-found)
    fetch_shard = min(want, per)
    fetch = min(want, n_shards * fetch_shard)
    method = _resolve_method(method, per, fetch_shard)
    sc, idx = _sharded_topk_jit(U_rows, V, mesh, axis, per, n_items,
                                fetch_shard, fetch, method, recall_target)
    if exclude is None:
        return sc[:, :k], idx[:, :k]
    return _filter_seen_jit(sc, idx, jnp.asarray(exclude), k)


# module-level jitted pieces: sharded serving is driven eagerly from
# recommend(); per-call closures would recompile on every call (r4 review)
_filter_seen_jit = jax.jit(_filter_seen, static_argnums=(3,))


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5, 6, 7, 8, 9))
def _sharded_topk_jit(U_rows, V, mesh, axis, per, n_items, fetch_shard,
                      fetch, method, recall_target):
    # out values are replicated by construction (identical all_gather+merge on
    # every shard) but the VMA checker can't infer that: check_vma=False.
    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(), P(axis, None)),
        out_specs=(P(), P()),
        check_vma=False,
    )
    def _shard_body(u, v_shard):
        shard_id = jax.lax.axis_index(axis)
        base = shard_id * per
        if method == "approx":
            s = _scores(u, v_shard)
            # mask padded tail rows of the last shard
            local_ids = jnp.arange(per) + base
            s = jnp.where(local_ids[None, :] < n_items, s, -jnp.inf)
            sc, idx = jax.lax.approx_max_k(s, fetch_shard,
                                           recall_target=recall_target)
        elif per <= _SMALL_N:
            s = _scores(u, v_shard)
            local_ids = jnp.arange(per) + base
            s = jnp.where(local_ids[None, :] < n_items, s, -jnp.inf)
            sc, idx = jax.lax.top_k(s, fetch_shard)
        else:
            # wide per-shard catalogs: the chunked running merge (full-row
            # lax.top_k over 100k+ lanes is VPU-sort-bound — the regime
            # _topk_exact_chunked exists for; r4 review). The valid bound
            # is shard-relative (traced: n_items - base).
            sc, idx = _topk_exact_chunked(u, v_shard, fetch_shard,
                                          n_valid=n_items - base)
        idx = idx + base
        # all_gather candidates from every shard, merge locally (replicated)
        sc_all = jax.lax.all_gather(sc, axis, axis=1)      # (B, S, fetch)
        idx_all = jax.lax.all_gather(idx, axis, axis=1)
        b = sc_all.shape[0]
        top_sc, pos = jax.lax.top_k(sc_all.reshape(b, -1), fetch)
        top_idx = jnp.take_along_axis(idx_all.reshape(b, -1), pos, axis=1)
        return top_sc, top_idx

    return _shard_body(U_rows, V)


__all__ = ["topk_scores", "sharded_topk", "grouped_exclusion_topk",
           "serving_permutation", "permuted_topk"]
