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


def _solve_bucket(V, bucket, cfg: SolveConfig, g0):
    wg, wr = objective_weights(bucket["values"], bucket["mask"], cfg.alpha)
    G, rhs = gram_rhs(V, bucket["indices"], wg, wr,
                      chunk=cfg.chunk,
                      compute_dtype=jnp.dtype(cfg.compute_dtype))
    if g0 is not None:
        G = G + g0
    degrees = bucket["mask"].sum(-1) if cfg.reg_by_degree else None
    G = add_ridge(G, cfg.reg, degrees)
    return solve_spd(G, rhs, cfg.solver)


def half_sweep(
    V: jnp.ndarray,
    buckets: DeviceBuckets,
    n_rows: int,
    cfg: SolveConfig,
) -> jnp.ndarray:
    """Solve every row of this orientation given the opposite table V.

    Returns the new (n_rows, k) factor table. Rows with zero observations
    solve to exactly zero (explicit) or the pure-G0 ridge solution (implicit
    with zero rhs => zero as well).
    """
    k = V.shape[-1]
    g0 = None
    if cfg.alpha is not None:
        g0 = jnp.einsum("nk,nl->kl", V, V,
                        preferred_element_type=jnp.float32)
    U = jnp.zeros((n_rows, k), jnp.float32)
    for bucket in buckets:
        x = _solve_bucket(V, bucket, cfg, g0)
        U = U.at[bucket["row_ids"]].set(x, mode="drop")
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


__all__ = ["DeviceBuckets", "device_buckets", "half_sweep", "masked_sse",
           "make_sweep_fns"]
