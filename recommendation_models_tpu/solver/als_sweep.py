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
from recommendation_models_tpu.data.layout import PaddedLayout
from recommendation_models_tpu.ops.gram import gram_rhs, objective_weights
from recommendation_models_tpu.ops.solve import (
    resolve_compute_dtype, solve_spd_flat,
)
from recommendation_models_tpu.utils.compat import match_vma

# A device bucket is a dict pytree: row_ids (B,), indices (B,P),
# values (B,P), mask (B,P).
DeviceBuckets = Tuple[Dict[str, jnp.ndarray], ...]


def device_buckets(layout: PaddedLayout) -> DeviceBuckets:
    """Convert a host PaddedLayout's buckets into a jit-friendly pytree."""
    return tuple(
        dict(
            row_ids=jnp.asarray(b.row_ids),
            indices=jnp.asarray(b.indices),
            values=jnp.asarray(b.values),
            mask=jnp.asarray(b.mask),
        )
        for b in layout.buckets
    )


def solve_all_buckets(V, buckets, n_rows: int, cfg: SolveConfig, g0,
                      with_sse=False):
    """Scatter-ADD every bucket's partial normal equations into one dense
    per-row system, then solve ALL rows in ONE batched Cholesky call.

    Whale rows arrive as several segments with the same row id (layout.py);
    gram additivity makes the scatter-add exact. The dense (n_rows, k, k)
    layout gives a single Pallas kernel shape per half-sweep, and the solve
    output IS the new factor table — no final scatter. Zero-degree rows
    solve against ridge(+G0) with rhs 0 => exactly 0.

    Returns (x (n_rows, k), sse-or-None).
    """
    k = V.shape[-1]
    dtype = jnp.dtype(resolve_compute_dtype(cfg.compute_dtype))
    # The dense per-row systems are kept FLAT (n_solve, k*k): a (n, k, k)
    # f32 array pads its minor k dim to the 128-lane tile (2x memory at
    # k=64 — an HBM OOM at the 100M-interaction scale); the flat form pads
    # nothing and converts to the kernel's batch-minor layout for free.
    # n_solve is pre-rounded to the kernel's batch-block multiple so the
    # solve wrapper never copies the whole array to pad it; extra rows get
    # zero normal equations (their sentinel scatter contributions carry
    # weight 0) and solve to exactly 0 against the ridge.
    from recommendation_models_tpu.ops.pallas.cholesky import block_batch
    n_solve = -(-max(n_rows, 1) // block_batch(k)) * block_batch(k)
    # G storage must stay f32: bf16-rounded grams (0.4% per entry) can lose
    # positive-definiteness — Cholesky NaNs on near-singular rows (measured).
    # The kernel therefore reads f32 systems; only the gather/matmul INPUTS
    # run bf16.
    store_dtype = jnp.float32
    G_dense = jnp.zeros((n_solve, k * k), store_dtype)
    rhs_dense = jnp.zeros((n_solve, k), jnp.float32)
    deg_dense = jnp.zeros((n_solve,), jnp.float32) if cfg.reg_by_degree else None
    r2 = jnp.zeros((), jnp.float32)
    for bucket in buckets:
        wg, wr = objective_weights(bucket["values"], bucket["mask"], cfg.alpha)
        rid = bucket["row_ids"]
        b, p = bucket["indices"].shape
        # Row-block big buckets so the gathered (rows, P, k) temp stays under
        # the HBM budget; each block scatter-adds straight into the dense
        # normal equations (peak memory = dense G + ONE block temp).
        bb = max(8, (cfg.gather_budget_mb * (1 << 20))
                 // (p * k * dtype.itemsize) // 8 * 8)
        if b <= bb:
            G, rhs = gram_rhs(V, bucket["indices"], wg, wr,
                              chunk=cfg.chunk, compute_dtype=dtype)
            G_dense = G_dense.at[rid].add(
                G.reshape(b, k * k).astype(store_dtype), mode="drop")
            rhs_dense = rhs_dense.at[rid].add(rhs, mode="drop")
        else:
            n_bb = -(-b // bb)
            pad = n_bb * bb - b
            idx_s = jnp.pad(bucket["indices"], ((0, pad), (0, 0))
                            ).reshape(n_bb, bb, p)
            wg_s = jnp.pad(wg, ((0, pad), (0, 0))).reshape(n_bb, bb, p)
            wr_s = jnp.pad(wr, ((0, pad), (0, 0))).reshape(n_bb, bb, p)
            rid_s = jnp.pad(rid, (0, pad), constant_values=n_solve
                            ).reshape(n_bb, bb)

            def body(carry, xs):
                Gd, rd = carry
                idx_b, wg_b, wr_b, rid_b = xs
                G, rhs = gram_rhs(V, idx_b, wg_b, wr_b,
                                  chunk=cfg.chunk, compute_dtype=dtype)
                return (Gd.at[rid_b].add(
                            G.reshape(bb, k * k).astype(store_dtype),
                            mode="drop"),
                        rd.at[rid_b].add(rhs, mode="drop")), None

            init = match_vma((G_dense, rhs_dense), (V, bucket["indices"]))
            (G_dense, rhs_dense), _ = jax.lax.scan(
                body, init, (idx_s, wg_s, wr_s, rid_s))
        if deg_dense is not None:
            deg_dense = deg_dense.at[rid].add(bucket["mask"].sum(-1),
                                              mode="drop")
        if with_sse:
            r2 = r2 + jnp.sum(bucket["mask"] * bucket["values"] ** 2)
    if g0 is not None:
        G_dense = G_dense + g0.reshape(-1).astype(store_dtype)
    if deg_dense is not None:
        reg_vec = cfg.reg * jnp.maximum(deg_dense, 1.0)
    else:
        reg_vec = jnp.full((n_solve,), cfg.reg, jnp.float32)
    x = solve_spd_flat(G_dense, rhs_dense, k, cfg.solver, reg_vec=reg_vec)
    if not with_sse:
        return x[:n_rows], None
    # Explicit-objective residual, free from the solve's own quantities:
    # sse_row = sum w r^2 - 2 x.rhs + x^T G x, and since the solver gives
    # (G + reg I) x = rhs exactly, x^T G x = x.rhs - reg ||x||^2 — the whole
    # quadratic term collapses to dot products over (n, k): no G transpose,
    # no (n, k, k) einsum. Summed over the *item* half-sweep's rows this
    # equals masked_sse(U_new, V_new) (tested).
    xr = jnp.einsum("bk,bk->", x, rhs_dense,
                    preferred_element_type=jnp.float32)
    xx = jnp.einsum("b,bk,bk->", reg_vec, x, x,
                    preferred_element_type=jnp.float32)
    sse = r2 - xr - xx
    return x[:n_rows], sse


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
    gather_budget_mb: int = 256,
) -> jnp.ndarray:
    """Sum of squared residuals over observed entries: Σ mask (r - u·v)^2.

    Used for train-RMSE / the tol-based sweep stopping rule (reference §3.1
    'compute train RMSE; break if Δ < tol'). Big buckets are processed in
    row-blocks (then degree chunks) so the gathered temp stays bounded.
    """
    k = V.shape[-1]
    total = jnp.zeros((), jnp.float32)

    def block_sse(rid_b, idx_b, val_b, msk_b):
        """SSE of one (bb, p) block, degree-chunked."""
        Ug = jnp.take(U, rid_b, axis=0, mode="fill", fill_value=0.0)
        p = idx_b.shape[1]
        n_chunks = -(-p // chunk)
        if n_chunks <= 1:
            Vg = jnp.take(V, idx_b, axis=0)
            pred = jnp.einsum("bk,bpk->bp", Ug, Vg,
                              preferred_element_type=jnp.float32)
            return jnp.sum(msk_b * (val_b - pred) ** 2)
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
        return part

    for b in buckets:
        idx, val, msk, rid = b["indices"], b["values"], b["mask"], b["row_ids"]
        bsz, p = idx.shape
        bb = max(8, (gather_budget_mb * (1 << 20))
                 // (min(p, chunk) * k * 4) // 8 * 8)
        if bsz <= bb:
            total = total + block_sse(rid, idx, val, msk)
            continue
        n_bb = -(-bsz // bb)
        pad = n_bb * bb - bsz
        idx_s = jnp.pad(idx, ((0, pad), (0, 0))).reshape(n_bb, bb, p)
        val_s = jnp.pad(val, ((0, pad), (0, 0))).reshape(n_bb, bb, p)
        msk_s = jnp.pad(msk, ((0, pad), (0, 0))).reshape(n_bb, bb, p)
        rid_s = jnp.pad(rid, (0, pad), constant_values=U.shape[0]
                        ).reshape(n_bb, bb)

        def outer(acc, xs):
            rid_b, idx_b, val_b, msk_b = xs
            return acc + block_sse(rid_b, idx_b, val_b, msk_b), None

        init = match_vma(jnp.zeros((), jnp.float32), (U, V, idx))
        part, _ = jax.lax.scan(outer, init, (rid_s, idx_s, val_s, msk_s))
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
        return masked_sse(U, V, ub, chunk=cfg.chunk)

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
):
    """One jitted program for the ENTIRE fit: ``lax.scan`` over sweeps.

    Returns fit(U, V) -> (U, V, sse_history (n_sweeps,)). Keeping the sweep
    loop on-device matters doubly on remote-attached TPUs where every host
    readback costs tens of ms of tunnel latency; the reference's per-sweep
    'compute train RMSE' (§3.1) becomes a device-side history read back once.
    """

    explicit = cfg.alpha is None

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def _fit(U, V, ub, ib):
        def body(carry, _):
            U, V = carry
            U = half_sweep(V, ub, n_users, cfg)
            if explicit:
                # SSE falls out of the item half-sweep's solves for free and
                # equals masked_sse(U_new, V_new) (tested).
                V, sse = half_sweep(U, ib, n_items, cfg, with_sse=True)
            else:
                V = half_sweep(U, ib, n_items, cfg)
                sse = masked_sse(U, V, ub, chunk=cfg.chunk)
            return (U, V), sse

        (U, V), sse = jax.lax.scan(body, (U, V), None, length=n_sweeps)
        return U, V, sse

    def fit(U, V):
        return _fit(U, V, user_buckets, item_buckets)

    return fit


__all__ = ["DeviceBuckets", "device_buckets", "half_sweep", "masked_sse",
           "make_sweep_fns", "make_scanned_fit"]
