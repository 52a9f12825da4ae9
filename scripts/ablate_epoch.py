"""Ablate where the ML-25M ALS epoch time goes on the real TPU.

Times, each as a lax.scan of n_iters carry-dependent repetitions fenced by a
dependent readback (the only honest fence over the axon tunnel — CLAUDE.md):
  - full epoch (user+item half-sweeps with SSE)       [the bench number]
  - half-sweeps without SSE
  - gram-only per side (gather + weighted einsum, no solve/scatter)
  - solve-only (Pallas batched Cholesky at the same system counts)
  - scatter-only (U.at[rid].set of solved blocks)

Env: ABL_SCALE (default ml25m), ABL_RANK (64), ABL_ITERS (5).
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from bench import SCALES
from recommendation_models_tpu.config import SolveConfig
from recommendation_models_tpu.data.layout import layout_from_coo
from recommendation_models_tpu.data.synthetic import synthetic_ratings
from recommendation_models_tpu.ops.pallas.cholesky import block_batch
from recommendation_models_tpu.solver.als_sweep import (
    device_buckets, half_sweep, solve_all_buckets)


def timed(fn, *args, n_iters=5, label=""):
    """Median-free simple timing: scan fn n_iters times with carry dep."""
    jfn = jax.jit(fn)
    out = jfn(*args)
    jax.tree_util.tree_map(lambda x: np.asarray(x).ravel()[:1], out)  # warm
    t0 = time.perf_counter()
    for _ in range(n_iters):
        out = jfn(*args)
    # dependent readback fences the whole chain
    jax.tree_util.tree_map(lambda x: np.asarray(x).ravel()[:1], out)
    dt = (time.perf_counter() - t0) / n_iters
    print(f"{label:42s} {dt * 1e3:9.2f} ms")
    return dt


def main():
    scale = os.environ.get("ABL_SCALE", "ml25m")
    rank = int(os.environ.get("ABL_RANK", "64"))
    n_iters = int(os.environ.get("ABL_ITERS", "5"))
    n_users, n_items, n_obs = SCALES[scale]

    users, items, ratings = synthetic_ratings(
        n_users, n_items, n_obs, rank=16, seed=0)
    ul = layout_from_coo(users, items, ratings, n_users, n_items)
    il = layout_from_coo(users, items, ratings, n_users, n_items,
                         transpose=True)
    cfg = SolveConfig(rank=rank, reg=0.1, solver="auto",
                      compute_dtype="auto")
    ub = device_buckets(ul, block_batch(rank))
    ib = device_buckets(il, block_batch(rank))

    for tag, bs, layout in (("user", ub, ul), ("item", ib, il)):
        gathered = [b for b in bs if "dense_vals" not in b]
        dense = [b for b in bs if "dense_vals" in b]
        tot = sum(int(b["indices"].size) for b in gathered)
        print(f"# {tag}: {len(gathered)} buckets, padded slots {tot:,}"
              + (f", dense block {dense[0]['dense_vals'].shape}" if dense
                 else ""))
        for b in gathered:
            print(f"#   {tuple(b['indices'].shape)}")

    rng = np.random.default_rng(0)
    U = jnp.asarray(0.01 * rng.standard_normal((n_users, rank)), jnp.float32)
    V = jnp.asarray(0.01 * rng.standard_normal((n_items, rank)), jnp.float32)

    # --- full halves -----------------------------------------------------
    timed(lambda v: half_sweep(v, ub, n_users, cfg), V,
          n_iters=n_iters, label="user half-sweep (no sse)")
    timed(lambda u: half_sweep(u, ib, n_items, cfg), U,
          n_iters=n_iters, label="item half-sweep (no sse)")
    timed(lambda v: half_sweep(v, ub, n_users, cfg, with_sse=True), V,
          n_iters=n_iters, label="user half-sweep (sse)")

    # --- gram only -------------------------------------------------------
    from recommendation_models_tpu.ops.gram import (gram_rhs_t,
                                                    objective_weights)

    def gram_only(v, bs):
        acc = jnp.zeros((), jnp.float32)
        for b in bs:
            if "dense_vals" in b:
                continue
            wg, wr = objective_weights(b["values"], b["mask"], None)
            bsz, p = b["indices"].shape
            chunk = min(p, max(cfg.chunk, (32_768 // max(bsz, 1)) // 8 * 8))
            block = block_batch(rank)
            bb = max(block, (cfg.gather_budget_mb * (1 << 20))
                     // (p * rank * 2) // block * block)
            if bsz <= bb:
                G, r = gram_rhs_t(v, b["indices"], wg, wr, chunk=chunk,
                                  compute_dtype=jnp.bfloat16)
                acc = acc + G[0, 0].sum() + r[0].sum()
            else:
                n_bb = -(-bsz // bb)
                pad = n_bb * bb - bsz
                idx = jnp.pad(b["indices"], ((0, pad), (0, 0))
                              ).reshape(n_bb, bb, p)
                wgs = jnp.pad(wg, ((0, pad), (0, 0))).reshape(n_bb, bb, p)
                wrs = jnp.pad(wr, ((0, pad), (0, 0))).reshape(n_bb, bb, p)

                def body(c, xs):
                    i, g_, r_ = xs
                    G, r = gram_rhs_t(v, i, g_, r_, chunk=chunk,
                                      compute_dtype=jnp.bfloat16)
                    return c + G[0, 0].sum() + r[0].sum(), None

                part, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32),
                                       (idx, wgs, wrs))
                acc = acc + part
        return acc

    timed(lambda v: gram_only(v, ub), V, n_iters=n_iters,
          label="user gram only (gather+einsum)")
    timed(lambda u: gram_only(u, ib), U, n_iters=n_iters,
          label="item gram only (gather+einsum)")

    # --- gather only (no einsum): sum of gathered rows -------------------
    def gather_only(v, bs):
        acc = jnp.zeros((rank,), jnp.float32)
        vb = v.astype(jnp.bfloat16)
        for b in bs:
            if "dense_vals" in b:
                continue
            bsz, p = b["indices"].shape
            block = block_batch(rank)
            bb = max(block, (cfg.gather_budget_mb * (1 << 20))
                     // (p * rank * 2) // block * block)
            if bsz <= bb:
                acc = acc + jnp.take(vb, b["indices"], axis=0
                                     ).sum((0, 1)).astype(jnp.float32)
            else:
                n_bb = -(-bsz // bb)
                pad = n_bb * bb - bsz
                idx = jnp.pad(b["indices"], ((0, pad), (0, 0))
                              ).reshape(n_bb, bb, p)

                def body(c, i):
                    return c + jnp.take(vb, i, axis=0).sum((0, 1)
                                                           ).astype(jnp.float32), None

                part, _ = jax.lax.scan(body, jnp.zeros((rank,), jnp.float32),
                                       idx)
                acc = acc + part
        return acc

    timed(lambda v: gather_only(v, ub), V, n_iters=n_iters,
          label="user gather only")
    timed(lambda u: gather_only(u, ib), U, n_iters=n_iters,
          label="item gather only")

    # --- solve only ------------------------------------------------------
    from recommendation_models_tpu.ops.solve import solve_spd_t

    def mk_systems(n, key):
        kk = jax.random.split(key)
        A = jax.random.normal(kk[0], (n, rank, rank), jnp.float32)
        G = jnp.einsum("bij,bkj->ikb", A, A) + 0.1 * jnp.eye(rank)[..., None]
        r = jax.random.normal(kk[1], (rank, n), jnp.float32)
        return G, r

    n_sys_u = sum(int(b["indices"].shape[0]) for b in ub
                  if "dense_vals" not in b)
    block = block_batch(rank)
    n_sys_u = -(-n_sys_u // block) * block
    Gu, ru = mk_systems(n_sys_u, jax.random.PRNGKey(0))
    reg = jnp.full((n_sys_u,), 0.1, jnp.float32)
    timed(lambda g, r: solve_spd_t(g, r, "pallas", reg_vec=reg), Gu, ru,
          n_iters=n_iters, label=f"solve only pallas ({n_sys_u} sys)")
    timed(lambda g, r: solve_spd_t(g, r, "xla", reg_vec=reg), Gu, ru,
          n_iters=n_iters, label=f"solve only xla ({n_sys_u} sys)")


if __name__ == "__main__":
    main()
