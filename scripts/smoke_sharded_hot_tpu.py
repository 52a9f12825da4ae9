"""Sharded + hot-column + Pallas smoke on the real TPU (r4 review finding:
the fused hot solve lacked the shard_map pcast of its unvarying operands —
the default-config sharded fit crashed with a vma mismatch ONLY on
compiled TPU; CPU CI resolves solver='auto' to 'xla' and interpret-mode
pallas cannot run under shard_map, so this path needs a real chip).

Builds ShardedALSProgram on a 1-device TPU mesh DIRECTLY (the estimator
routes n_shards=1 to the single-device path, which has no shard_map/vma).

Run: python scripts/smoke_sharded_hot_tpu.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    assert jax.devices()[0].platform == "tpu", jax.devices()

    from recommendation_models_tpu.config import DataConfig, SolveConfig
    from recommendation_models_tpu.data.layout import (
        layout_from_coo, shard_layout)
    from recommendation_models_tpu.data.synthetic import synthetic_ratings
    from recommendation_models_tpu.models.als import ALS
    from recommendation_models_tpu.parallel.mesh import get_mesh, to_host
    from recommendation_models_tpu.parallel.sharded_als import (
        ShardedALSProgram)

    n_users, n_items, rank = 4_000, 3_000, 16
    users, items, ratings = synthetic_ratings(n_users, n_items, 200_000,
                                              rank=8, seed=0)
    dcfg = DataConfig(dense_whales=False, hot_cols=16)
    ul = layout_from_coo(users, items, ratings, n_users, n_items,
                         config=dcfg)
    assert ul.hot_ids is not None, "hot block not built — smoke is vacuous"
    il = layout_from_coo(users, items, ratings, n_users, n_items,
                         config=dcfg, transpose=True)
    mesh = get_mesh(1)                      # 1-device TPU mesh: shard_map+vma
    cfg = SolveConfig(rank=rank, reg=0.1, solver="pallas")
    prog = ShardedALSProgram(shard_layout(ul, 1), shard_layout(il, 1),
                             mesh, cfg)
    U, V = prog.init_factors(seed=1, init_scale=0.1)
    U, V, sse = prog.sweep_with_sse(U, V)   # the vma-crash configuration
    Uh = to_host(U)[:n_users]
    assert np.isfinite(Uh).all() and np.isfinite(float(sse))

    # parity vs the single-device XLA path on the same warm start
    import scipy.sparse as sp
    R = sp.csr_matrix((ratings, (users, items)), shape=(n_users, n_items))
    rng = np.random.default_rng(1)
    U0 = 0.1 * rng.standard_normal((n_users, rank)).astype(np.float32)
    V0 = 0.1 * rng.standard_normal((n_items, rank)).astype(np.float32)
    ref = ALS(rank=rank, reg=0.1, n_sweeps=2, solver="xla",
              hot_cols=0, dense_min_degree=10_000).fit(R, U0=U0, V0=V0)
    Up, Vp = prog.place_factors(U0, V0)
    fit = prog.make_fit(2)
    Up, Vp, hist, _ = fit(Up, Vp)
    np.testing.assert_allclose(
        np.sqrt(np.maximum(np.asarray(hist), 0) / ratings.shape[0]),
        ref.history_, rtol=1e-3)
    print(f"sharded+hot+pallas smoke OK: sse {float(sse):.3f}, "
          f"history parity vs XLA anchor within 1e-3")


if __name__ == "__main__":
    main()
