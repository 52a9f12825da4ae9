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
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from recommendation_models_tpu.config import SolveConfig
from recommendation_models_tpu.data.layout import PaddedLayout
from recommendation_models_tpu.ops.gram import gram_rhs, objective_weights
from recommendation_models_tpu.ops.solve import add_ridge, solve_spd

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


def solve_all_buckets(V, buckets, cfg: SolveConfig, g0, with_sse=False):
    """Gram-accumulate every bucket, then solve ALL rows in ONE batched
    Cholesky call.

    Per-bucket shapes differ (degree buckets), but the (B, k, k) normal
    equations all share k — concatenating along the batch before the solve
    means a single Pallas kernel shape per half-sweep (one Mosaic compile,
    one launch) instead of one per bucket. Returns (x_all, row_ids_all[,
    sse]); ``row_ids_all`` carries each bucket's scatter targets in the same
    order.
    """
    Gs, rhss, rids, degs = [], [], [], []
    r2 = jnp.zeros((), jnp.float32)
    for bucket in buckets:
        wg, wr = objective_weights(bucket["values"], bucket["mask"], cfg.alpha)
        G, rhs = gram_rhs(V, bucket["indices"], wg, wr,
                          chunk=cfg.chunk,
                          compute_dtype=jnp.dtype(cfg.compute_dtype))
        if g0 is not None:
            G = G + g0
        Gs.append(G)
        rhss.append(rhs)
        rids.append(bucket["row_ids"])
        if cfg.reg_by_degree:
            degs.append(bucket["mask"].sum(-1))
        if with_sse:
            r2 = r2 + jnp.sum(bucket["mask"] * bucket["values"] ** 2)
    G_all = jnp.concatenate(Gs, axis=0) if len(Gs) > 1 else Gs[0]
    rhs_all = jnp.concatenate(rhss, axis=0) if len(rhss) > 1 else rhss[0]
    rid_all = jnp.concatenate(rids, axis=0) if len(rids) > 1 else rids[0]
    degrees = (jnp.concatenate(degs, axis=0) if len(degs) > 1 else degs[0]) \
        if cfg.reg_by_degree else None
    x_all = solve_spd(add_ridge(G_all, cfg.reg, degrees), rhs_all, cfg.solver)
    if not with_sse:
        return x_all, rid_all, None
    # Explicit-objective residual, free from the solve's own quantities:
    # sse_row = sum w r^2 - 2 x.rhs + x^T (G - ridge) x. Summed over the
    # *item* half-sweep's rows this equals masked_sse(U_new, V_new) (tested)
    # — replaces a whole extra gather/einsum eval pass.
    gx = jnp.einsum("bkl,bl->bk", G_all, x_all,
                    preferred_element_type=jnp.float32)
    sse = r2 + jnp.einsum("bk,bk->", x_all, gx - 2.0 * rhs_all,
                          preferred_element_type=jnp.float32)
    return x_all, rid_all, sse


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
    k = V.shape[-1]
    g0 = None
    if cfg.alpha is not None:
        g0 = jnp.einsum("nk,nl->kl", V, V,
                        preferred_element_type=jnp.float32)
    x_all, rid_all, sse = solve_all_buckets(V, buckets, cfg, g0,
                                            with_sse=with_sse)
    U = jnp.zeros((n_rows, k), jnp.float32).at[rid_all].set(x_all, mode="drop")
    if with_sse:
        return U, sse
    return U


def masked_sse(
    U: jnp.ndarray,
    V: jnp.ndarray,
    buckets: DeviceBuckets,
    chunk: int = 512,
) -> jnp.ndarray:
    """Sum of squared residuals over observed entries: Σ mask (r - u·v)^2.

    Used for train-RMSE / the tol-based sweep stopping rule (reference §3.1
    'compute train RMSE; break if Δ < tol').
    """
    total = jnp.zeros((), jnp.float32)
    for b in buckets:
        Ug = jnp.take(U, b["row_ids"], axis=0, mode="fill", fill_value=0.0)
        idx, val, msk = b["indices"], b["values"], b["mask"]
        p = idx.shape[1]
        n_chunks = -(-p // chunk)
        if n_chunks <= 1:
            Vg = jnp.take(V, idx, axis=0)
            pred = jnp.einsum("bk,bpk->bp", Ug, Vg,
                              preferred_element_type=jnp.float32)
            total = total + jnp.sum(msk * (val - pred) ** 2)
        else:
            pad = n_chunks * chunk - p
            if pad:
                idx = jnp.pad(idx, ((0, 0), (0, pad)))
                val = jnp.pad(val, ((0, 0), (0, pad)))
                msk = jnp.pad(msk, ((0, 0), (0, pad)))
            idx_c = idx.reshape(-1, n_chunks, chunk).swapaxes(0, 1)
            val_c = val.reshape(-1, n_chunks, chunk).swapaxes(0, 1)
            msk_c = msk.reshape(-1, n_chunks, chunk).swapaxes(0, 1)

            def body(acc, xs):
                i_c, v_c, m_c = xs
                Vg = jnp.take(V, i_c, axis=0)
                pred = jnp.einsum("bk,bpk->bp", Ug, Vg,
                                  preferred_element_type=jnp.float32)
                return acc + jnp.sum(m_c * (v_c - pred) ** 2), None

            from recommendation_models_tpu.utils.compat import match_vma
            init = match_vma(jnp.zeros((), jnp.float32), (U, V, idx, val))
            part, _ = jax.lax.scan(body, init, (idx_c, val_c, msk_c))
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
