"""Measure the scanned sharded fit vs the per-sweep host loop on the real
chip (VERDICT r3 task 3 'Done' criterion: a measured sharded-epoch delta on
a 1-shard mesh, recorded in BASELINE.md).

Builds a 1-shard TPU mesh ShardedALSProgram on an ML-1M-shaped synthetic
problem and times, for the same sweep count:
  (a) stepwise: prog.sweep + prog.train_sse + float() readback per sweep
      (the pre-r4 estimator loop — one host round-trip and one surplus
      user-half exchange per sweep), and
  (b) scanned: prog.make_fit (one jitted lax.scan device program, SSE
      riding the item half's solves, one readback total).

Timing discipline per CLAUDE.md: warm both programs first; end each timed
region with a dependent np.asarray readback (block_until_ready does not
fence over the axon tunnel).

  python scripts/measure_sharded_scan.py            # ml1m shape, rank 64
  SCALE=ml25m RANK=64 SWEEPS=10 python scripts/measure_sharded_scan.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np
import jax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SCALES = {
    "ml25m": (162_541, 62_423, 25_000_000),
    "ml1m": (6_040, 3_706, 1_000_209),
    "tiny": (2_000, 1_500, 120_000),
}


def main():
    scale = os.environ.get("SCALE", "ml1m")
    rank = int(os.environ.get("RANK", "64"))
    n_sweeps = int(os.environ.get("SWEEPS", "10"))
    n_shards = int(os.environ.get("SHARDS", "1"))
    n_users, n_items, n_obs = SCALES[scale]

    from recommendation_models_tpu.config import (
        DataConfig, SolveConfig, bucket_growth_for_rank)
    from recommendation_models_tpu.data.layout import (
        layout_from_coo, shard_layout)
    from recommendation_models_tpu.data.synthetic import synthetic_ratings
    from recommendation_models_tpu.ops.pallas.cholesky import block_batch
    from recommendation_models_tpu.parallel.mesh import get_mesh
    from recommendation_models_tpu.parallel.sharded_als import (
        ShardedALSProgram)

    users, items, ratings = synthetic_ratings(n_users, n_items, n_obs,
                                              rank=16, seed=0)
    # Default: dense-whale/hot-column OFF for an exchange-agnostic compare
    # (the all_to_all path cannot run them). FASTPATHS=1 uses the
    # allgather PRODUCTION layout config (both fast paths on, as
    # ALS._fit_sharded builds it) — the number to quote next to the
    # single-device epoch.
    fastpaths = os.environ.get("FASTPATHS", "0") == "1"
    if fastpaths:
        from recommendation_models_tpu.config import dense_min_degree_for_rank
        from recommendation_models_tpu.ops.pallas.cholesky import (
            hot_cols_auto)
        hot = hot_cols_auto(rank)
        if hot == 0:
            # at rank>64 the production auto policy itself turns the hot-
            # column path off (BASELINE.md r3) — the label 'both fast paths
            # on' only holds at k<=64; say so rather than mislabel
            print(f"# FASTPATHS note: hot_cols_auto({rank}) == 0 — the "
                  "production config at this rank runs WITHOUT the "
                  "hot-column path", file=sys.stderr)
        # dense_min_degree must be the rank-aware production threshold:
        # the plain builder default (512) is NOT what ALS._fit_sharded uses
        # at rank 128 (2048 — break-even scales k^2; ADVICE r4)
        dcfg = DataConfig(bucket_growth=bucket_growth_for_rank(rank),
                          hot_cols=hot,
                          dense_min_degree=dense_min_degree_for_rank(rank))
    else:
        dcfg = DataConfig(dense_whales=False, hot_cols=0,
                          bucket_growth=bucket_growth_for_rank(rank))
    ul = shard_layout(layout_from_coo(users, items, ratings, n_users,
                                      n_items, config=dcfg), n_shards,
                      row_multiple=block_batch(rank))
    il = shard_layout(layout_from_coo(users, items, ratings, n_users,
                                      n_items, config=dcfg, transpose=True),
                      n_shards, row_multiple=block_batch(rank))
    mesh = get_mesh(n_shards)
    cfg = SolveConfig(rank=rank, reg=0.1)
    prog = ShardedALSProgram(ul, il, mesh, cfg)
    nnz = ratings.shape[0]

    # ---- (a) stepwise loop (pre-r4 estimator behavior) ----
    U, V = prog.init_factors(seed=0, init_scale=0.01)
    U, V = prog.sweep(U, V)                       # warm both programs
    _ = float(prog.train_sse(U, V))
    U, V = prog.init_factors(seed=0, init_scale=0.01)
    _ = np.asarray(U)[0, 0], np.asarray(V)[0, 0]  # fence placement
    t0 = time.perf_counter()
    hist_a = []
    for _ in range(n_sweeps):
        U, V = prog.sweep(U, V)
        hist_a.append(float(prog.train_sse(U, V)))  # per-sweep readback
    stepwise_s = time.perf_counter() - t0

    # ---- (b) scanned whole-fit program ----
    fit = prog.make_fit(n_sweeps)
    U, V = prog.init_factors(seed=0, init_scale=0.01)
    U, V, sse, _ = fit(U, V)                      # warm/compile
    _ = np.asarray(sse)
    U, V = prog.init_factors(seed=0, init_scale=0.01)
    _ = np.asarray(U)[0, 0], np.asarray(V)[0, 0]
    t0 = time.perf_counter()
    U, V, sse, _ = fit(U, V)
    hist_b = np.asarray(sse)                      # ONE dependent readback
    scanned_s = time.perf_counter() - t0

    # f32 association noise between the stepwise and scanned schedules
    # (measured 2.05e-4 max rel at ML-1M rank-64 on the v5e); parity at
    # bitwise level is covered by tests/test_sharded_scan.py on CPU.
    # FASTPATHS adds dense-whale/hot-column partial-SSE terms whose
    # summation order differs between the two programs on bf16-input
    # grams (measured 7.4e-4 at ML-25M) — hence the wider band there.
    rtol = 2e-3 if fastpaths else 5e-4
    np.testing.assert_allclose(hist_a, hist_b, rtol=rtol)
    print(f"{scale} rank={rank} sweeps={n_sweeps} shards={n_shards} "
          f"device={jax.devices()[0].device_kind}")
    print(f"stepwise: {stepwise_s:.4f} s total, "
          f"{stepwise_s / n_sweeps * 1e3:.1f} ms/sweep")
    print(f"scanned:  {scanned_s:.4f} s total, "
          f"{scanned_s / n_sweeps * 1e3:.1f} ms/sweep  "
          f"({(stepwise_s - scanned_s) / n_sweeps * 1e3:+.1f} ms/sweep)")


if __name__ == "__main__":
    main()
