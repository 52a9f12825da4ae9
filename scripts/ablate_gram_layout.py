"""Quantify the user-half gram relayout tax: klb-emitting einsum (current)
vs batch-major bkl einsum with natural gather layouts.

Profiling (scripts/profile_half.py) shows the user half's row-block-scanned
buckets pay ~28 ms/epoch in pure relayout copies: the gathered (bb, P, k)
block is copied {2,1,0}->{1,2,0} before the klb gram dot, and nothing says
the dot itself is happy. If emitting "bpk,bpl->bkl" (k-minor output, natural
k-minor inputs) removes those copies, the Pallas solve kernel can ingest the
batch-major gram and transpose blocks in VMEM (a 2D (bt, k^2) transpose,
~free next to two HBM round-trips).

Env: ABL_SCALE (ml25m), ABL_RANK (64), ABL_ITERS (5), ABL_SIDE (user).
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from bench import SCALES
from recommendation_models_tpu.config import SolveConfig
from recommendation_models_tpu.data.layout_cache import load_layout, save_layout
from recommendation_models_tpu.ops.gram import gram_rhs_t, objective_weights
from recommendation_models_tpu.ops.pallas.cholesky import block_batch
from recommendation_models_tpu.solver.als_sweep import device_buckets
from scripts.ablate_epoch import timed


def _blocks(b, cfg, rank):
    """Mirror solve_all_buckets' row-block split for one bucket."""
    bsz, p = b["indices"].shape
    chunk = min(p, max(cfg.chunk, (32_768 // max(bsz, 1)) // 8 * 8))
    block = block_batch(rank)
    from recommendation_models_tpu.solver.als_sweep import (
        resolve_gather_budget)
    # single-bucket view: resolve against this bucket's own padded volume
    bb = max(block, (resolve_gather_budget(cfg.gather_budget_mb, rank, [b])
                     * (1 << 20)) // (p * rank * 2) // block * block)
    return bsz, p, chunk, bb


def gram_klb(v, bs, cfg, rank):
    """Current path: gram_rhs_t emitting (k, k, bb) inside the row scan."""
    acc = jnp.zeros((), jnp.float32)
    for b in bs:
        if "indices" not in b:
            continue
        wg, wr = objective_weights(b["values"], b["mask"], None)
        bsz, p, chunk, bb = _blocks(b, cfg, rank)
        if bsz <= bb:
            G, r = gram_rhs_t(v, b["indices"], wg, wr, chunk=chunk,
                              compute_dtype=jnp.bfloat16)
            acc = acc + G.sum() + r.sum()
            continue
        n_bb = -(-bsz // bb)
        pad = n_bb * bb - bsz
        idx = jnp.pad(b["indices"], ((0, pad), (0, 0))).reshape(n_bb, bb, p)
        wgs = jnp.pad(wg, ((0, pad), (0, 0))).reshape(n_bb, bb, p)
        wrs = jnp.pad(wr, ((0, pad), (0, 0))).reshape(n_bb, bb, p)

        def body(c, xs):
            i, g_, r_ = xs
            G, r = gram_rhs_t(v, i, g_, r_, chunk=chunk,
                              compute_dtype=jnp.bfloat16)
            return c + G.sum() + r.sum(), None

        part, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32),
                               (idx, wgs, wrs))
        acc = acc + part
    return acc


def gram_bkl(v, bs, cfg, rank):
    """Batch-major variant: einsum bpk,bpl->bkl with natural layouts."""
    vb = v.astype(jnp.bfloat16)
    acc = jnp.zeros((), jnp.float32)
    for b in bs:
        if "indices" not in b:
            continue
        wg, wr = objective_weights(b["values"], b["mask"], None)
        bsz, p, chunk, bb = _blocks(b, cfg, rank)

        def one(idx_b, wg_b, wr_b):
            Vg = jnp.take(vb, idx_b, axis=0)                    # (bb, P, k)
            Vw = Vg * wg_b[..., None].astype(jnp.bfloat16)
            G = jnp.einsum("bpk,bpl->bkl", Vw, Vg,
                           preferred_element_type=jnp.float32)
            r = jnp.einsum("bpk,bp->bk", Vg, wr_b.astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32)
            return G.sum() + r.sum()

        if bsz <= bb:
            acc = acc + one(b["indices"], wg, wr)
            continue
        n_bb = -(-bsz // bb)
        pad = n_bb * bb - bsz
        idx = jnp.pad(b["indices"], ((0, pad), (0, 0))).reshape(n_bb, bb, p)
        wgs = jnp.pad(wg, ((0, pad), (0, 0))).reshape(n_bb, bb, p)
        wrs = jnp.pad(wr, ((0, pad), (0, 0))).reshape(n_bb, bb, p)

        def body(c, xs):
            return c + one(*xs), None

        part, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32),
                               (idx, wgs, wrs))
        acc = acc + part
    return acc


def main():
    scale = os.environ.get("ABL_SCALE", "ml25m")
    rank = int(os.environ.get("ABL_RANK", "64"))
    n_iters = int(os.environ.get("ABL_ITERS", "5"))
    side = os.environ.get("ABL_SIDE", "user")
    n_users, n_items, n_obs = SCALES[scale]
    cache = os.environ.get("ABL_CACHE_DIR", "/tmp/rmtpu_abl_cache")
    path = os.path.join(cache, f"{scale}_{side}.npz")
    try:
        layout = load_layout(path)
    except Exception:
        from recommendation_models_tpu.data.layout import layout_from_coo
        from recommendation_models_tpu.data.synthetic import synthetic_ratings
        users, items, ratings = synthetic_ratings(
            n_users, n_items, n_obs, rank=16, seed=0)
        os.makedirs(cache, exist_ok=True)
        layout = layout_from_coo(users, items, ratings, n_users, n_items,
                                 transpose=(side == "item"))
        save_layout(path, layout)
    cfg = SolveConfig(rank=rank, reg=0.1, solver="auto", compute_dtype="auto")
    bs = device_buckets(layout, block_batch(rank))
    n_opp = n_items if side == "user" else n_users
    rng = np.random.default_rng(0)
    T = jnp.asarray(0.01 * rng.standard_normal((n_opp, rank)), jnp.float32)

    timed(lambda t, b: gram_klb(t, b, cfg, rank), T, bs, n_iters=n_iters,
          label=f"{side} gram klb (current)")
    timed(lambda t, b: gram_bkl(t, b, cfg, rank), T, bs, n_iters=n_iters,
          label=f"{side} gram bkl (batch-major)")


if __name__ == "__main__":
    main()
