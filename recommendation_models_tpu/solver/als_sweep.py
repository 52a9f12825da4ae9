"""Jitted ALS sweeps (SURVEY.md N3): the reference's hot path.

Reference call stack (SURVEY.md §3.1): `ALS.fit` runs two Python-level
per-row loops per sweep — for each user: CSR row slice, gram accumulation,
`scipy.linalg.solve` — optionally fanned across a CPU process pool.

Here one *half-sweep* is a single jitted function: for every degree bucket,
a batched chunked gram accumulation (ops.gram) + batched Cholesky solve
(ops.solve) + scatter into the factor table. Buckets are a static pytree, so
the whole sweep traces once per layout shape-set; there is no per-row Python.

The implicit objective adds the global gramian G0 = V^T V once per half-sweep
(SURVEY.md N7) — computed here single-device; the sharded version psums it.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from recommendation_models_tpu.config import SolveConfig
from recommendation_models_tpu.data.layout import (PaddedLayout,
                                                    bucket_row_multiple)
from recommendation_models_tpu.ops.gram import gram_rhs_t, objective_weights
from recommendation_models_tpu.ops.solve import (
    resolve_compute_dtype, solve_spd_flat, solve_spd_t, solve_spd_t_hot,
)
from recommendation_models_tpu.utils.compat import match_vma

# A device bucket is a dict pytree: row_ids (B,), indices (B,P),
# values (B,P), mask (B,P).
DeviceBuckets = Tuple[Dict[str, jnp.ndarray], ...]


def device_buckets(layout: PaddedLayout,
                   row_multiple: int = 1) -> DeviceBuckets:
    """Convert a host PaddedLayout's buckets into a jit-friendly pytree.

    ``row_multiple`` rounds each bucket's row count up (host-side, cheap) —
    pass the solve kernel's batch block (``ops.pallas.cholesky.block_batch``)
    so the per-bucket solves never pay a whole-array pad copy on device.
    Extra rows carry the ``n_rows`` sentinel id and zero mask: they solve
    against the bare ridge to exactly zero and scatter-drop.

    Buckets SMALLER than ``row_multiple`` (typically wide whale buckets with
    a handful of rows) are NOT inflated: padding an 8-row x 100k-wide bucket
    to 256 rows would multiply its gather volume 32x, while the solve
    wrapper's pad copy of a tiny (B, k^2) G is free by comparison.
    """
    out = []
    for b in layout.buckets:
        rid, idx, val, msk = b.row_ids, b.indices, b.values, b.mask
        hv = getattr(b, "hot_vals", None)
        n, p = idx.shape
        mult = bucket_row_multiple(n, row_multiple)
        np_rows = -(-n // mult) * mult
        if np_rows != n:
            pad = np_rows - n
            rid = np.concatenate(
                [rid, np.full(pad, layout.n_rows, rid.dtype)])
            idx = np.concatenate([idx, np.zeros((pad, p), idx.dtype)])
            val = np.concatenate([val, np.zeros((pad, p), val.dtype)])
            msk = np.concatenate([msk, np.zeros((pad, p), msk.dtype)])
            if hv is not None:
                hv = np.concatenate(
                    [hv, np.zeros((pad, hv.shape[1]), hv.dtype)])
        d = dict(
            row_ids=jnp.asarray(rid),
            indices=jnp.asarray(idx),
            values=jnp.asarray(val),
            mask=jnp.asarray(msk),
        )
        if hv is not None:
            # transposed (C, B): the fused solve kernel streams (C, bt)
            # blocks with the batch on lanes, like everything else.
            # bf16 on device — Mosaic has no f16 (host cache keeps f16);
            # exact for half-star ratings either way.
            d["hot_vals"] = jnp.asarray(np.ascontiguousarray(hv.T)
                                        ).astype(jnp.bfloat16)
        out.append(d)
    if getattr(layout, "dense_ids", None) is not None:
        out.append(dict(
            dense_ids=jnp.asarray(layout.dense_ids),
            dense_vals=jnp.asarray(layout.dense_vals),
        ))
    if getattr(layout, "hot_ids", None) is not None:
        out.append(dict(hot_ids=jnp.asarray(layout.hot_ids)))
    return tuple(out)


def widen_chunk(chunk: int, b: int, p: int) -> int:
    """Degree-axis chunk for one bucket: small-batch WIDE (whale) buckets
    widen the chunk so every scan step gathers ~32k rows instead of
    hundreds of latency-bound (8, chunk, k) steps. The ONE definition for
    the solve and SSE passes (r4 review: two verbatim copies)."""
    return min(p, max(chunk, (32_768 // max(b, 1)) // 8 * 8))


def resolve_gather_budget(budget_mb: int, k: int, buckets,
                          for_sse: bool = False) -> int:
    """The ONE resolution point for the auto (0) gather budget: rank- and
    problem-size-aware (config.gather_budget_for_rank), with the size taken
    from the actual padded bucket volume this consumer will gather — the
    unsplit k>64 mode OOMs HBM at 100M-interaction scale (measured), so it
    is gated by size, and every consumer (single-device, sharded, hybrid,
    sse) resolves HERE rather than each entry point re-implementing the
    gate.

    ``for_sse``: the standalone residual pass has no solve to pipeline
    against, so tiny blocks only pay scan overhead — it floors the k<=64
    auto at 8 MB (measured: the implicit ML-25M epoch, whose sse is a
    separate pass, runs 0.186 s with an 8 MB sse budget vs 0.201 with the
    solve path's 2 MB applied to both)."""
    if budget_mb:
        return budget_mb
    from recommendation_models_tpu.config import gather_budget_for_rank
    total = sum(int(b["indices"].size) for b in buckets if "indices" in b)
    budget = gather_budget_for_rank(k, total)
    if for_sse:
        budget = max(budget, 8)
    return budget


def _split_special(buckets):
    """Separate the dense-whale block and the hot-column id entry (if any)
    from the gather buckets."""
    dense = [b for b in buckets if "dense_vals" in b]
    hot = [b for b in buckets if "hot_ids" in b]
    gathered = tuple(b for b in buckets
                     if "dense_vals" not in b and "hot_ids" not in b)
    return (gathered, dense[0] if dense else None,
            hot[0]["hot_ids"] if hot else None)


def dense_gram_rhs(V, vals, alpha, compute_dtype, col_chunk: int = 32_768):
    """Normal equations for the dense block via the dense gramian:
    ``G_w = V^T diag(wg_w) V`` computed as ONE (W, n) x (n, k^2) MXU matmul
    against the outer-product feature matrix ``P[n] = vec(V_n V_n^T)`` —
    no gathers (the matmul runs at MXU rate while a gathered wide bucket is
    gather-latency-bound; measured break-even degree is a few hundred).

    ``vals`` is (W, n), float16, with 0 = unobserved. Columns are processed
    in ``col_chunk`` blocks, and the observation mask / objective weights are
    derived per block, so no (W, n) float32 temp ever materializes (at
    dense_min_degree=512 scale W is thousands of rows — a full-width f32
    mask would be GBs).

    Returns (G (W, k^2), rhs (W, k), deg (W,), r2 scalar) where deg is the
    per-row observation count and r2 = sum of mask * vals^2 (the explicit
    objective's residual constant).
    """
    k = V.shape[-1]
    # iterate the VALUE matrix's width, not the table's row count: a
    # sharded fit's allgathered table is padded to rows_per_shard * S
    # rows (> n_cols when the catalog doesn't divide the shard count) and
    # the padded rows carry no observations (fuzz-found: the mismatched
    # final chunk was a shape error)
    n = vals.shape[1]
    w = vals.shape[0]
    Vc = V.astype(compute_dtype)
    G = jnp.zeros((w, k * k), jnp.float32)
    rhs = jnp.zeros((w, k), jnp.float32)
    deg = jnp.zeros((w,), jnp.float32)
    r2 = jnp.zeros((), jnp.float32)
    for s in range(0, n, col_chunk):
        e = min(s + col_chunk, n)
        v_c = vals[:, s:e].astype(jnp.float32)
        m_c = (v_c != 0).astype(jnp.float32)
        wg, wr = objective_weights(v_c, m_c, alpha)
        Vs = Vc[s:e]
        P = (Vs[:, :, None] * Vs[:, None, :]).reshape(e - s, k * k)
        G = G + jnp.matmul(wg.astype(compute_dtype), P,
                           preferred_element_type=jnp.float32)
        rhs = rhs + jnp.matmul(wr.astype(compute_dtype), Vs,
                               preferred_element_type=jnp.float32)
        deg = deg + m_c.sum(-1)
        r2 = r2 + jnp.sum(m_c * v_c * v_c)
    return G, rhs, deg, r2


def solve_all_buckets(V, buckets, n_rows: int, cfg: SolveConfig, g0,
                      with_sse=False):
    """Solve every bucket's normal equations INDEPENDENTLY and scatter-SET
    the solved (B, k) factors into the table.

    Row ids are unique across buckets (layout.py: whale rows stay whole in
    wide buckets), so each bucket's gram IS the row's full system — there is
    no dense (n_rows, k*k) accumulation and, critically, no k^2-wide XLA
    scatter-ADD (measured ~5x slower than the same-volume gather; it
    dominated the ML-25M epoch). Only the k-wide solutions scatter.
    Zero-degree rows solve against ridge(+G0) with rhs 0 => exactly 0.

    Returns (x (n_rows, k), sse-or-None).
    """
    k = V.shape[-1]
    dtype = jnp.dtype(resolve_compute_dtype(cfg.compute_dtype))
    from recommendation_models_tpu.ops.pallas.cholesky import block_batch
    block = block_batch(k)
    buckets, dense, hot_ids = _split_special(buckets)
    budget_mb = resolve_gather_budget(cfg.gather_budget_mb, k, buckets)
    # Hot-column block (layout.py): each bucket's hot gram/rhs contributions
    # are (k*k, C) x (C, bt) MXU dots computed INSIDE the fused solve kernel
    # (ops.solve.solve_spd_t_hot) from the raw (C, B) slab and the hot
    # factor rows below — the hot gram never exists in HBM.
    hot_vT = None
    if hot_ids is not None:
        # f32 rows holding compute-dtype-rounded values: the fused solve
        # kernel builds the EXACT outer-product table from them in VMEM, so
        # G_hot is an exact gram of the same rounded table the gathered
        # path contracts (guaranteed PSD; ops/pallas/cholesky docstrings)
        vh = jnp.take(V, hot_ids, axis=0).astype(dtype
                                                 ).astype(jnp.float32)
        hot_vT = jnp.transpose(vh, (1, 0))                      # (k, C) f32
    # G storage must stay f32: bf16-rounded grams (0.4% per entry) can lose
    # positive-definiteness — Cholesky NaNs on near-singular rows (measured).
    # Only the gather/matmul INPUTS run bf16.
    U = match_vma(jnp.zeros((n_rows, k), jnp.float32),
                  (V,) + tuple(b["indices"] for b in buckets))
    r2 = xr = xx = jnp.zeros((), jnp.float32)
    g0_flat = None if g0 is None else g0.reshape(-1).astype(jnp.float32)
    if dense is not None:
        G, rhs, ddeg, dr2 = dense_gram_rhs(V, dense["dense_vals"], cfg.alpha,
                                           dtype)
        if g0_flat is not None:
            G = G + g0_flat
        if cfg.reg_by_degree:
            reg_vec = cfg.reg * jnp.maximum(ddeg, 1.0)
        else:
            reg_vec = jnp.full((G.shape[0],), cfg.reg, jnp.float32)
        x = solve_spd_flat(G, rhs, k, cfg.solver, reg_vec=reg_vec)
        if dtype != jnp.float32:
            # bf16 compute rounds each outer product INSIDE dense_gram_rhs's
            # P matrix (Σ w·round(v vᵀ) is NOT an exact gram — CLAUDE.md's
            # PSD rule), so a near-degenerate whale gram can dip below the
            # ridge and NaN its Cholesky. Guard: re-solve NaN rows with a
            # trace-proportional jitter (covers the ~0.4%/entry rounding
            # perturbation). One extra cheap (W, k, k) batched solve; a
            # no-op whenever all rows are finite — the common case.
            diag_ix = jnp.arange(k) * (k + 1)
            tr = jnp.maximum(G[:, diag_ix].mean(-1), 0.0)
            x_safe = solve_spd_flat(G, rhs, k, cfg.solver,
                                    reg_vec=reg_vec + 0.02 * tr)
            # catch finite garbage too: the kernel's pivot clamp
            # (max(d, 1e-30)) can turn a mildly indefinite system into
            # huge-but-finite entries instead of NaN (r4 review) —
            # legitimate factors are O(1..1e3), so 1e12 is unambiguous
            bad = (jnp.isnan(x) | (jnp.abs(x) > 1e12)).any(-1,
                                                           keepdims=True)
            x = jnp.where(bad, x_safe, x)
        U = U.at[dense["dense_ids"]].set(x, mode="drop")
        if with_sse:
            r2 = r2 + dr2
            xr = xr + jnp.einsum("bk,bk->", x, rhs,
                                 preferred_element_type=jnp.float32)
            xx = xx + jnp.einsum("b,bk,bk->", reg_vec, x, x,
                                 preferred_element_type=jnp.float32)
    g0_t = None if g0 is None else g0.astype(jnp.float32)[:, :, None]
    for bucket in buckets:
        wg, wr = objective_weights(bucket["values"], bucket["mask"], cfg.alpha)
        rid = bucket["row_ids"]
        hv = bucket.get("hot_vals") if hot_vT is not None else None  # (C, B)
        b, p = bucket["indices"].shape
        chunk = widen_chunk(cfg.chunk, b, p)
        if cfg.reg_by_degree:
            deg_row = bucket["mask"].sum(-1)
            if hv is not None:
                deg_row = deg_row + (hv != 0).astype(jnp.float32).sum(0)
            reg_row = cfg.reg * jnp.maximum(deg_row, 1.0)
        else:
            reg_row = jnp.full((b,), cfg.reg, jnp.float32)
        if cfg.reg == 0 and g0 is None:
            # reg=0: zero-degree rows (padding sentinels AND truly empty
            # rows) have G=0, rhs=0 — chol(0) factors to NaN. Their rhs is
            # zero, so ANY positive ridge solves them to exactly 0: floor
            # it. Statically gated — zero cost on the normal reg>0 path.
            # (r4 review; the implicit objective's g0 keeps G PD instead.)
            deg0 = bucket["mask"].sum(-1)
            if hv is not None:
                deg0 = deg0 + (hv != 0).astype(jnp.float32).sum(0)
            reg_row = jnp.where(deg0 > 0, reg_row, 1.0)
        # Row-block big buckets so the gathered (rows, P, k) temp stays
        # under the HBM budget. The SOLVE runs inside the scan too, so a
        # big bucket's (k, k, bb) normal equations exist one block at a
        # time — the full (B, k^2) G is never materialized. bb is a
        # multiple of the solve kernel's batch block.
        bb = max(block, (budget_mb * (1 << 20))
                 // (p * k * dtype.itemsize) // block * block)

        def solve_block(idx_b, wg_b, wr_b, reg_b, hv_b=None):
            # gram straight to the kernel's batch-minor (k, k, bb) layout:
            # no whole-array transpose between gram and solve (measured
            # ~35 ms/half-sweep at ML-25M otherwise)
            Gt, rt = gram_rhs_t(V, idx_b, wg_b, wr_b,
                                chunk=chunk, compute_dtype=dtype)
            if g0_t is not None:
                Gt = Gt + g0_t
            if hv_b is not None:
                # hot-column gram/rhs are computed INSIDE the fused solve
                # kernel from the raw (C, bb) slab — never in HBM
                xt = solve_spd_t_hot(Gt, rt, hv_b, hot_vT,
                                     alpha=cfg.alpha, solver=cfg.solver,
                                     reg_vec=reg_b)           # (k, bb)
            else:
                xt = solve_spd_t(Gt, rt, cfg.solver, reg_vec=reg_b)
            if with_sse:
                if hv_b is not None:
                    # the SSE identity needs x . rhs_TOTAL; recompute the
                    # (small) hot rhs term here — only the with_sse half
                    # pays it
                    hv_f = hv_b.astype(jnp.float32)
                    hm = (hv_f != 0).astype(jnp.float32)
                    _, hwr = objective_weights(hv_f, hm, cfg.alpha)
                    rt = rt + jnp.matmul(hot_vT, hwr,
                                         preferred_element_type=jnp.float32,
                                         precision=jax.lax.Precision.HIGHEST)
                xr_b = jnp.einsum("kb,kb->", xt, rt,
                                  preferred_element_type=jnp.float32)
                xx_b = jnp.einsum("b,kb,kb->", reg_b, xt, xt,
                                  preferred_element_type=jnp.float32)
                return xt, xr_b, xx_b
            return xt, jnp.float32(0), jnp.float32(0)

        if b <= bb:
            xt, xr_b, xx_b = solve_block(bucket["indices"], wg, wr, reg_row,
                                         hv)
            x = jnp.transpose(xt, (1, 0))
            xr, xx = xr + xr_b, xx + xx_b
        else:
            n_bb = -(-b // bb)
            pad = n_bb * bb - b
            idx_s = jnp.pad(bucket["indices"], ((0, pad), (0, 0))
                            ).reshape(n_bb, bb, p)
            wg_s = jnp.pad(wg, ((0, pad), (0, 0))).reshape(n_bb, bb, p)
            wr_s = jnp.pad(wr, ((0, pad), (0, 0))).reshape(n_bb, bb, p)
            reg_s = jnp.pad(reg_row, (0, pad), constant_values=cfg.reg
                            ).reshape(n_bb, bb)
            rid = jnp.pad(rid, (0, pad), constant_values=n_rows)
            b = n_bb * bb
            xs = (idx_s, wg_s, wr_s, reg_s)
            if hv is not None:
                # (C, B) -> (n_bb, C, bb): pad the batch axis, block it,
                # bring the block index to the front for the scan
                hv_s = jnp.pad(hv, ((0, 0), (0, pad))
                               ).reshape(hv.shape[0], n_bb, bb)
                xs = xs + (jnp.moveaxis(hv_s, 1, 0),)

            def body(carry, xs):
                cxr, cxx = carry
                xt, xr_b, xx_b = solve_block(*xs)
                return (cxr + xr_b, cxx + xx_b), jnp.transpose(xt, (1, 0))

            init = match_vma((jnp.zeros((), jnp.float32),
                              jnp.zeros((), jnp.float32)),
                             (V, bucket["indices"]))
            (xr_b, xx_b), x = jax.lax.scan(body, init, xs)
            x = x.reshape(b, k)
            xr, xx = xr + xr_b, xx + xx_b
        U = U.at[rid].set(x, mode="drop")
        if with_sse:
            # Explicit-objective residual, free from the solve's own
            # quantities: sse_row = sum w r^2 - 2 x.rhs + x^T G x, and since
            # the solver gives (G + reg I) x = rhs exactly, x^T G x =
            # x.rhs - reg ||x||^2 — the whole quadratic term collapses to
            # dot products over (k, b). Summed over the *item* half-sweep's
            # rows this equals masked_sse(U_new, V_new) (tested).
            # CAVEAT: the identity subtracts O(r2)-sized terms, so its f32
            # absolute error is ~r2 * eps — near-INTERPOLATION fits (tiny
            # reg, rank >= degree) can report SSE ~0 (even slightly
            # negative; callers clamp) where the true residual is ~1e-4 of
            # the data scale. Production-scale residuals are far above
            # that; the direct masked_sse path has no such cancellation.
            r2 = r2 + jnp.sum(bucket["mask"] * bucket["values"] ** 2)
            if hv is not None:
                hv_f = hv.astype(jnp.float32)
                r2 = r2 + jnp.sum(jnp.where(hv_f != 0, hv_f * hv_f, 0.0))
    if not with_sse:
        return U, None
    return U, r2 - xr - xx


def half_sweep(
    V: jnp.ndarray,
    buckets: DeviceBuckets,
    n_rows: int,
    cfg: SolveConfig,
    with_sse: bool = False,
):
    """Solve every row of this orientation given the opposite table V.

    Returns the new (n_rows, k) factor table (plus, with ``with_sse`` on the
    explicit objective, the total residual SSE at the post-solve state).
    Rows with zero observations solve to exactly zero (explicit) or the
    pure-G0 ridge solution (implicit with zero rhs => zero as well).
    """
    g0 = None
    if cfg.alpha is not None:
        g0 = jnp.einsum("nk,nl->kl", V, V,
                        preferred_element_type=jnp.float32)
    U, sse = solve_all_buckets(V, buckets, n_rows, cfg, g0, with_sse=with_sse)
    if with_sse:
        return U, sse
    return U


def masked_sse(
    U: jnp.ndarray,
    V: jnp.ndarray,
    buckets: DeviceBuckets,
    chunk: int = 512,
    gather_budget_mb: int = 0,
) -> jnp.ndarray:
    """Sum of squared residuals over observed entries: Σ mask (r - u·v)^2.

    Used for train-RMSE / the tol-based sweep stopping rule (reference §3.1
    'compute train RMSE; break if Δ < tol'). Big buckets are processed in
    row-blocks (then degree chunks) so the gathered temp stays bounded.
    ``gather_budget_mb=0`` resolves to the rank-aware auto policy
    (config.gather_budget_for_rank), same as the solve path.
    """
    k = V.shape[-1]
    buckets, dense, hot_ids = _split_special(buckets)
    gather_budget_mb = resolve_gather_budget(gather_budget_mb, k, buckets,
                                             for_sse=True)
    hot_V = None if hot_ids is None else jnp.take(V, hot_ids, axis=0)
    total = jnp.zeros((), jnp.float32)
    if dense is not None:
        vals = dense["dense_vals"]                     # (W, n_cols) f16
        Ud = jnp.take(U, dense["dense_ids"], axis=0, mode="fill",
                      fill_value=0.0)
        n = vals.shape[1]      # NOT V.shape[0]: sharded tables are padded
        # 16k column chunks keep the (W, chunk) f32 pred temp bounded even
        # at the dense-budget cap (W can be tens of thousands of rows).
        for s in range(0, n, 16_384):
            e = min(s + 16_384, n)
            pred = jnp.einsum("wk,nk->wn", Ud, V[s:e],
                              preferred_element_type=jnp.float32)
            v = vals[:, s:e].astype(jnp.float32)
            total = total + jnp.sum(jnp.where(v != 0, (v - pred) ** 2, 0.0))

    def block_sse(rid_b, idx_b, val_b, msk_b, chunk, hv_b=None):
        """SSE of one (bb, p) block, degree-chunked. hv_b is (C, bb)."""
        Ug = jnp.take(U, rid_b, axis=0, mode="fill", fill_value=0.0)
        part0 = jnp.zeros((), jnp.float32)
        if hv_b is not None:
            hv_f = hv_b.astype(jnp.float32)
            pred_h = jnp.einsum("ck,bk->cb", hot_V, Ug,
                                preferred_element_type=jnp.float32)
            part0 = jnp.sum(jnp.where(hv_f != 0, (hv_f - pred_h) ** 2, 0.0))
        p = idx_b.shape[1]
        n_chunks = -(-p // chunk)
        if n_chunks <= 1:
            Vg = jnp.take(V, idx_b, axis=0)
            pred = jnp.einsum("bk,bpk->bp", Ug, Vg,
                              preferred_element_type=jnp.float32)
            return part0 + jnp.sum(msk_b * (val_b - pred) ** 2)
        pad = n_chunks * chunk - p
        if pad:
            idx_b = jnp.pad(idx_b, ((0, 0), (0, pad)))
            val_b = jnp.pad(val_b, ((0, 0), (0, pad)))
            msk_b = jnp.pad(msk_b, ((0, 0), (0, pad)))
        idx_c = idx_b.reshape(-1, n_chunks, chunk).swapaxes(0, 1)
        val_c = val_b.reshape(-1, n_chunks, chunk).swapaxes(0, 1)
        msk_c = msk_b.reshape(-1, n_chunks, chunk).swapaxes(0, 1)

        def body(acc, xs):
            i_c, v_c, m_c = xs
            Vg = jnp.take(V, i_c, axis=0)
            pred = jnp.einsum("bk,bpk->bp", Ug, Vg,
                              preferred_element_type=jnp.float32)
            return acc + jnp.sum(m_c * (v_c - pred) ** 2), None

        init = match_vma(jnp.zeros((), jnp.float32), (U, V, idx_b))
        part, _ = jax.lax.scan(body, init, (idx_c, val_c, msk_c))
        return part0 + part

    for b in buckets:
        idx, val, msk, rid = b["indices"], b["values"], b["mask"], b["row_ids"]
        hv = b.get("hot_vals") if hot_V is not None else None
        bsz, p = idx.shape
        chunk_b = widen_chunk(chunk, bsz, p)
        bb = max(8, (gather_budget_mb * (1 << 20))
                 // (min(p, chunk_b) * k * 4) // 8 * 8)
        if bsz <= bb:
            total = total + block_sse(rid, idx, val, msk, chunk_b, hv)
            continue
        n_bb = -(-bsz // bb)
        pad = n_bb * bb - bsz
        idx_s = jnp.pad(idx, ((0, pad), (0, 0))).reshape(n_bb, bb, p)
        val_s = jnp.pad(val, ((0, pad), (0, 0))).reshape(n_bb, bb, p)
        msk_s = jnp.pad(msk, ((0, pad), (0, 0))).reshape(n_bb, bb, p)
        rid_s = jnp.pad(rid, (0, pad), constant_values=U.shape[0]
                        ).reshape(n_bb, bb)
        xs = (rid_s, idx_s, val_s, msk_s)
        if hv is not None:
            hv_s = jnp.pad(hv, ((0, 0), (0, pad))
                           ).reshape(hv.shape[0], n_bb, bb)
            xs = xs + (jnp.moveaxis(hv_s, 1, 0),)

        def outer(acc, xs):
            return acc + block_sse(*xs[:4], chunk_b, *xs[4:]), None

        init = match_vma(jnp.zeros((), jnp.float32), (U, V, idx))
        part, _ = jax.lax.scan(outer, init, xs)
        total = total + part
    return total


def make_sweep_fns(
    user_buckets: DeviceBuckets,
    item_buckets: DeviceBuckets,
    n_users: int,
    n_items: int,
    cfg: SolveConfig,
):
    """Build the jitted (sweep, train_sse) functions for one layout.

    sweep(U, V) -> (U', V'): one full alternating sweep (users given V, then
    items given the *new* U — matching the reference's update order §3.1).

    Buckets are passed as jit arguments (not closure constants) so the big
    index/value blocks live once in HBM; U/V are donated across sweeps.
    """

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def _sweep(U, V, ub, ib):
        U = half_sweep(V, ub, n_users, cfg)
        V = half_sweep(U, ib, n_items, cfg)
        return U, V

    @jax.jit
    def _train_sse(U, V, ub):
        return masked_sse(U, V, ub, chunk=cfg.chunk,
                          gather_budget_mb=cfg.gather_budget_mb)

    def sweep(U, V):
        return _sweep(U, V, user_buckets, item_buckets)

    def train_sse(U, V):
        return _train_sse(U, V, user_buckets)

    return sweep, train_sse


def make_scanned_fit(
    user_buckets: DeviceBuckets,
    item_buckets: DeviceBuckets,
    n_users: int,
    n_items: int,
    cfg: SolveConfig,
    n_sweeps: int,
    tol: float = 0.0,
    nnz: int = 1,
):
    """One jitted program for the ENTIRE fit: ``lax.scan`` over sweeps.

    Returns fit(U, V) -> (U, V, sse_history (n_sweeps,), n_done). Keeping the sweep
    loop on-device matters doubly on remote-attached TPUs where every host
    readback costs tens of ms of tunnel latency; the reference's per-sweep
    'compute train RMSE' (§3.1) becomes a device-side history read back once.

    ``tol > 0`` switches the scan to a ``lax.while_loop`` with the
    reference's stopping rule (§3.1 'break if Δ train-RMSE < tol') evaluated
    ON DEVICE — early stopping costs zero host round-trips. Sweeps never run
    leave -1 in the history (the host trims them off).
    """

    # Riding identity vs separate masked_sse pass: measured per config
    # class (r5 whole-epoch A/B, config.sse_separate_for — riding looks
    # free but loses 18 ms/epoch at the ML-25M-rank-64 class, and wins
    # everywhere else measured). cfg.sse_mode overrides.
    from recommendation_models_tpu.config import sse_separate_for
    separate = sse_separate_for(cfg, nnz)

    def one_sweep(U, V, ub, ib):
        U = half_sweep(V, ub, n_users, cfg)
        if separate:
            V = half_sweep(U, ib, n_items, cfg)
            sse = masked_sse(U, V, ub, chunk=cfg.chunk,
                             gather_budget_mb=cfg.gather_budget_mb)
        else:
            # SSE falls out of the item half-sweep's solves via the
            # identity sse = sum w r^2 - 2 x.rhs + x^T G x (equals
            # masked_sse(U_new, V_new); tested)
            V, sse = half_sweep(U, ib, n_items, cfg, with_sse=True)
        return U, V, sse

    # the generic wrapper owns the scan/while_loop/tol/history machinery
    # (one copy for single-device, sharded, and hybrid fits — r4 review
    # deduped the three near-verbatim implementations)
    return make_scanned_program_fit(one_sweep, n_sweeps, tol, nnz,
                                    (user_buckets, item_buckets))


def make_scanned_program_fit(sweep_sse, n_sweeps: int, tol: float, nnz: int,
                             extra: tuple):
    """Generic whole-fit-as-one-device-program wrapper (VERDICT r3 task 3).

    ``sweep_sse(U, V, *extra) -> (U, V, sse)`` is any traceable sweep (the
    sharded / hybrid programs pass their shard_mapped sweep+SSE body);
    ``extra`` carries the bucket/plan pytrees as JIT ARGUMENTS so the big
    index/value blocks are not baked into the executable as constants.

    Returns ``fit(U, V) -> (U, V, sse_history (n_sweeps,), n_done)`` with
    the same contract as ``make_scanned_fit``: zero per-sweep host
    readbacks, tol evaluated device-side in a ``lax.while_loop``, sweeps
    never run left as -1 in the history.
    """

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def _fit(U, V, *extra):
        def body(carry, _):
            U, V = carry
            U, V, sse = sweep_sse(U, V, *extra)
            return (U, V), sse

        (U, V), sse = jax.lax.scan(body, (U, V), None, length=n_sweeps)
        return U, V, sse, jnp.int32(n_sweeps)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def _fit_tol(U, V, *extra):
        hist0 = jnp.full((n_sweeps,), -1.0, jnp.float32)  # -1 = not run

        def cond(carry):
            _, _, hist, i = carry
            prev = jnp.sqrt(jnp.maximum(hist[jnp.maximum(i - 2, 0)], 0.0)
                            / nnz)
            cur = jnp.sqrt(jnp.maximum(hist[jnp.maximum(i - 1, 0)], 0.0)
                           / nnz)
            improving = jnp.logical_or(i < 2, jnp.abs(prev - cur) >= tol)
            return jnp.logical_and(i < n_sweeps, improving)

        def body(carry):
            U, V, hist, i = carry
            U, V, sse = sweep_sse(U, V, *extra)
            return U, V, hist.at[i].set(sse), i + 1

        U, V, hist, i = jax.lax.while_loop(
            cond, body, (U, V, hist0, jnp.int32(0)))
        return U, V, hist, i

    def fit(U, V):
        if tol > 0:
            return _fit_tol(U, V, *extra)
        return _fit(U, V, *extra)

    return fit


__all__ = ["DeviceBuckets", "device_buckets", "half_sweep", "masked_sse",
           "make_sweep_fns", "make_scanned_fit",
           "make_scanned_program_fit", "resolve_gather_budget",
           "solve_all_buckets", "widen_chunk"]
