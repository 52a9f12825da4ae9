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


def timed(fn, x, *args, n_iters=5, label=""):
    """Time ``fn(x, *args)`` as ONE device program: a lax.scan of n_iters
    carry-dependent repetitions (the carry perturbs ``x`` by ~1e-30 so
    nothing hoists), fenced by a dependent readback. ``args`` (e.g. the
    bucket pytrees) are jit ARGUMENTS, never closure constants — closures
    bake hundreds of MB of layout data into the HLO and blow the remote
    compile service's request limit (HTTP 413)."""

    def scanned(x, *rest):
        def body(c, _):
            out = fn(x + c, *rest)
            leaf = jax.tree_util.tree_leaves(out)[0]
            return jnp.asarray(leaf, jnp.float32).ravel()[0] * 1e-30, None
        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=n_iters)
        return c

    jfn = jax.jit(scanned)
    np.asarray(jfn(x, *args))          # compile + warm
    t0 = time.perf_counter()
    np.asarray(jfn(x, *args))          # dependent readback = the fence
    dt = (time.perf_counter() - t0) / n_iters
    print(f"{label:42s} {dt * 1e3:9.2f} ms")
    return dt


def main():
    scale = os.environ.get("ABL_SCALE", "ml25m")
    rank = int(os.environ.get("ABL_RANK", "64"))
    n_iters = int(os.environ.get("ABL_ITERS", "5"))
    n_users, n_items, n_obs = SCALES[scale]

    from recommendation_models_tpu.data.layout_cache import (
        load_layout, save_layout)
    from recommendation_models_tpu.config import (
        DataConfig, dense_min_degree_for_rank)
    from recommendation_models_tpu.ops.pallas.cholesky import hot_cols_auto

    # rank-aware layout policy, cache files shared with bench.py's
    # BENCH_LAYOUT_CACHE naming (ABL_HOT / ABL_DMD override)
    hot = int(os.environ.get("ABL_HOT", hot_cols_auto(rank)))
    dmd = int(os.environ.get("ABL_DMD", dense_min_degree_for_rank(rank)))
    dcfg = DataConfig(hot_cols=hot, dense_min_degree=dmd)
    cache = os.environ.get("ABL_CACHE_DIR", "/tmp/rmtpu_bench_cache")
    os.makedirs(cache, exist_ok=True)
    up = os.path.join(cache, f"{scale}.hot{hot}.dmd{dmd}.user.npz")
    ip = os.path.join(cache, f"{scale}.hot{hot}.dmd{dmd}.item.npz")
    if os.path.exists(up) and os.path.exists(ip):
        ul, il = load_layout(up), load_layout(ip)
    else:
        users, items, ratings = synthetic_ratings(
            n_users, n_items, n_obs, rank=16, seed=0)
        ul = layout_from_coo(users, items, ratings, n_users, n_items,
                             config=dcfg)
        il = layout_from_coo(users, items, ratings, n_users, n_items,
                             transpose=True, config=dcfg)
        save_layout(up, ul)
        save_layout(ip, il)
    gmb = os.environ.get("ABL_GATHER_MB")
    cfg = SolveConfig(rank=rank, reg=0.1, solver="auto",
                      compute_dtype="auto",
                      **({"gather_budget_mb": int(gmb)} if gmb else {}))
    ub = device_buckets(ul, block_batch(rank))
    ib = device_buckets(il, block_batch(rank))

    for tag, bs, layout in (("user", ub, ul), ("item", ib, il)):
        gathered = [b for b in bs if "indices" in b]
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

    # --- full halves (skip with ABL_ONLY=gram for quick gram reruns) -----
    only = os.environ.get("ABL_ONLY")
    if only != "gram":
        timed(lambda v, b: half_sweep(v, b, n_users, cfg), V, ub,
              n_iters=n_iters, label="user half-sweep (no sse)")
        timed(lambda u, b: half_sweep(u, b, n_items, cfg), U, ib,
              n_iters=n_iters, label="item half-sweep (no sse)")
        timed(lambda v, b: half_sweep(v, b, n_users, cfg, with_sse=True),
              V, ub, n_iters=n_iters, label="user half-sweep (sse)")
        ib_no_dense = tuple(x for x in ib if "dense_vals" not in x)
        if len(ib_no_dense) != len(ib):
            timed(lambda u, b: half_sweep(u, b, n_items, cfg), U, ib_no_dense,
                  n_iters=n_iters, label="item half-sweep (no dense block)")

    # --- gram only -------------------------------------------------------
    from recommendation_models_tpu.ops.gram import (gram_rhs_t,
                                                    objective_weights)

    def gram_only(v, bs, p_lo=0, p_hi=1 << 30):
        # consume the FULL (k,k,b) gram: summing a single [0,0] entry lets
        # XLA dead-code-eliminate the einsum down to a 1-feature gather for
        # non-scanned buckets (measured: item 'gram' looked 3x cheaper than
        # reality until this bit)
        acc = jnp.zeros((), jnp.float32)
        for b in bs:
            if "indices" not in b:
                continue
            if not (p_lo <= b["indices"].shape[1] < p_hi):
                continue
            wg, wr = objective_weights(b["values"], b["mask"], None)
            bsz, p = b["indices"].shape
            chunk = min(p, max(cfg.chunk, (32_768 // max(bsz, 1)) // 8 * 8))
            block = block_batch(rank)
            from recommendation_models_tpu.solver.als_sweep import (
                resolve_gather_budget)
            budget = resolve_gather_budget(cfg.gather_budget_mb, rank, bs)
            bb = max(block, (budget * (1 << 20))
                     // (p * rank * 2) // block * block)
            if bsz <= bb:
                G, r = gram_rhs_t(v, b["indices"], wg, wr, chunk=chunk,
                                  compute_dtype=jnp.bfloat16)
                acc = acc + G.sum() + r.sum()
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
                    return c + G.sum() + r.sum(), None

                part, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32),
                                       (idx, wgs, wrs))
                acc = acc + part
        return acc

    timed(gram_only, V, ub, n_iters=n_iters,
          label="user gram only (gather+einsum)")
    timed(gram_only, U, ib, n_iters=n_iters,
          label="item gram only (gather+einsum)")
    timed(lambda u, b: gram_only(u, b, 0, cfg.chunk + 1), U, ib,
          n_iters=n_iters, label="item gram, narrow buckets (p<=chunk)")
    timed(lambda u, b: gram_only(u, b, cfg.chunk + 1), U, ib,
          n_iters=n_iters, label="item gram, wide buckets (p>chunk)")
    if only == "gram":
        return

    # --- gather only (no einsum): sum of gathered rows -------------------
    def gather_only(v, bs):
        acc = jnp.zeros((rank,), jnp.float32)
        vb = v.astype(jnp.bfloat16)
        for b in bs:
            if "indices" not in b:
                continue
            bsz, p = b["indices"].shape
            block = block_batch(rank)
            from recommendation_models_tpu.solver.als_sweep import (
                resolve_gather_budget)
            budget = resolve_gather_budget(cfg.gather_budget_mb, rank, bs)
            bb = max(block, (budget * (1 << 20))
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

    timed(gather_only, V, ub, n_iters=n_iters,
          label="user gather only")
    timed(gather_only, U, ib, n_iters=n_iters,
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
                  if "indices" in b)
    block = block_batch(rank)
    n_sys_u = -(-n_sys_u // block) * block
    # cap the probe batch: (k, k, n) f32 systems at k=128 / 162k rows would
    # be ~10 GB of HBM arguments; per-system rate is flat past ~64k systems
    # (measured), so probe a sample and scale by count when reading results
    n_sys_u = min(n_sys_u, 64 * 1024)
    Gu, ru = mk_systems(n_sys_u, jax.random.PRNGKey(0))
    reg = jnp.full((n_sys_u,), 0.1, jnp.float32)
    # dense-whale block alone (no gathers — one MXU matmul per col chunk)
    dense_u = [b for b in ub if "dense_vals" in b]
    dense_i = [b for b in ib if "dense_vals" in b]
    from recommendation_models_tpu.solver.als_sweep import dense_gram_rhs
    for tag, d, tbl in (("user", dense_u, V), ("item", dense_i, U)):
        if not d:
            continue
        timed(lambda t, dv: dense_gram_rhs(t, dv, cfg.alpha, jnp.bfloat16),
              tbl, d[0]["dense_vals"], n_iters=n_iters,
              label=f"{tag} dense-block gram ({d[0]['dense_vals'].shape[0]} rows)")

    timed(lambda g, r: solve_spd_t(g, r, "pallas", reg_vec=reg), Gu, ru,
          n_iters=n_iters, label=f"solve only pallas ({n_sys_u} sys)")
    # the remote XLA compiler dies on six-figure cholesky batches — cap it
    nx = min(n_sys_u, 8192)
    timed(lambda g, r: solve_spd_t(g, r, "xla", reg_vec=reg[:nx]),
          Gu[:, :, :nx], ru[:, :nx],
          n_iters=n_iters, label=f"solve only xla ({nx} sys)")

    # per-bucket solve structure: one solve_spd_t per ITEM bucket size (the
    # item half runs 24 separate small solves — measure their combined
    # latency vs one big batched solve of the same total systems)
    sizes = [int(b["indices"].shape[0]) for b in ib if "indices" in b]
    Gb, rb = mk_systems(max(sizes), jax.random.PRNGKey(1))

    def per_bucket_solve(g, r):
        acc = jnp.zeros((rank,), jnp.float32)
        for n in sizes:
            x = solve_spd_t(g[:, :, :n], r[:, :n], "pallas",
                            reg_vec=jnp.full((n,), 0.1, jnp.float32))
            acc = acc + x[:, 0]
        return acc

    timed(per_bucket_solve, Gb, rb, n_iters=n_iters,
          label=f"item per-bucket solves ({len(sizes)} buckets, "
                f"{sum(sizes)} sys)")

    # scatter structure: one .at[rid].set per item bucket
    rids = [b["row_ids"] for b in ib if "indices" in b]
    xs = [jnp.ones((int(r.shape[0]), rank), jnp.float32) for r in rids]

    def per_bucket_scatter(u0, rids_, xs_):
        u = u0
        for r, x in zip(rids_, xs_):
            u = u.at[r].set(x, mode="drop")
        return u

    timed(per_bucket_scatter, jnp.zeros((n_items + 1, rank), jnp.float32),
          rids, xs, n_iters=n_iters,
          label=f"item per-bucket scatters ({len(rids)})")


if __name__ == "__main__":
    main()
