"""Epoch-time + collective-bytes comparison of the sharded exchange modes
(allgather vs all_to_all vs hybrid) on the 8-device virtual CPU mesh.

Single-host CPU timings are INDICATIVE only (no ICI; XLA CPU collectives
are memcpys) — the decision-grade numbers are the analytic per-shard bytes,
which are exact for any mesh. Results go to BASELINE.md's exchange section.

Env: EX_SCALE (ml1m), EX_RANK (32), EX_SWEEPS (4), EX_SHARDS (8),
EX_HEADS (comma list for hybrid; default 1024,4096).

EX_BYTES_ONLY=1 skips device work entirely and prints the analytic
per-shard bytes for a LIST of shard counts (EX_SHARDS becomes a comma
list) — the pod-scale projection the scaling model in BASELINE.md uses.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    scale = os.environ.get("EX_SCALE", "ml1m")
    rank = int(os.environ.get("EX_RANK", "32"))
    n_sweeps = int(os.environ.get("EX_SWEEPS", "4"))
    S = (None if os.environ.get("EX_BYTES_ONLY")
         else int(os.environ.get("EX_SHARDS", "8")))
    heads = [int(h) for h in
             os.environ.get("EX_HEADS", "1024,4096").split(",")]

    from bench import SCALES
    from recommendation_models_tpu.config import SolveConfig, DataConfig
    from recommendation_models_tpu.data.layout import (layout_from_coo,
                                                       shard_layout)
    from recommendation_models_tpu.data.synthetic import synthetic_ratings
    from recommendation_models_tpu.ops.pallas.cholesky import block_batch
    from recommendation_models_tpu.parallel.mesh import get_mesh
    from recommendation_models_tpu.parallel.sharded_als import (
        ShardedALSProgram)

    n_users, n_items, n_obs = SCALES[scale]
    users, items, ratings = synthetic_ratings(n_users, n_items, n_obs,
                                              rank=16, seed=0)

    if os.environ.get("EX_BYTES_ONLY"):
        from recommendation_models_tpu.parallel.exchange import (
            build_exchange_plan)
        shard_counts = [int(s) for s in
                        os.environ.get("EX_SHARDS", "8,32,128").split(",")]
        plain = DataConfig(dense_whales=False, hot_cols=0)
        ul0 = layout_from_coo(users, items, ratings, n_users, n_items,
                              config=plain)
        il0 = layout_from_coo(users, items, ratings, n_users, n_items,
                              transpose=True, config=plain)
        print(f"# {scale} rank={rank} nnz={ratings.shape[0]} "
              f"(bytes/shard/half-sweep, user half = item-table traffic)")
        for S in shard_counts:
            ul = shard_layout(ul0, S, row_multiple=block_batch(rank))
            il = shard_layout(il0, S, row_multiple=block_batch(rank))
            ag = (S - 1) * il.rows_per_shard * rank * 4
            row = [f"S={S:4d}  allgather {ag / 2**20:9.2f} MiB"]
            for head in [0] + heads:
                p = build_exchange_plan(ul, il.rows_per_shard, head=head)
                lbl = "a2a" if head == 0 else f"hyb(H={head})"
                row.append(f"{lbl} {p.recv_bytes_per_half_sweep(rank) / 2**20:9.2f}"
                           f" MiB (eff {p.padding_efficiency():.2f})")
            print("  ".join(row))
        return

    mesh = get_mesh(S, platform="cpu")
    cfg = SolveConfig(rank=rank, reg=0.1, solver="xla",
                      compute_dtype="float32")

    def build(dcfg):
        ul = layout_from_coo(users, items, ratings, n_users, n_items,
                             config=dcfg)
        il = layout_from_coo(users, items, ratings, n_users, n_items,
                             transpose=True, config=dcfg)
        return (shard_layout(ul, S, row_multiple=block_batch(rank)),
                shard_layout(il, S, row_multiple=block_batch(rank)))

    plain = DataConfig(dense_whales=False, hot_cols=0)
    runs = [("allgather", 0, plain), ("all_to_all", 0, plain)]
    runs += [("hybrid", h, plain) for h in heads]

    print(f"# {scale} rank={rank} shards={S} sweeps={n_sweeps} "
          f"nnz={ratings.shape[0]}")
    for mode, head, dcfg in runs:
        t0 = time.perf_counter()
        ul, il = build(dcfg)
        prog = ShardedALSProgram(ul, il, mesh, cfg, exchange=mode, head=head)
        t_build = time.perf_counter() - t0
        U, V = prog.init_factors(0, 0.01)
        U, V = prog.sweep(U, V)                     # compile + warm
        _ = np.asarray(U[0, 0])
        t0 = time.perf_counter()
        for _ in range(n_sweeps):
            U, V = prog.sweep(U, V)
        _ = np.asarray(U[0, 0]), np.asarray(V[0, 0])
        dt = (time.perf_counter() - t0) / n_sweeps
        b = prog.collective_bytes_per_sweep()
        label = mode if not head else f"{mode}(H={head})"
        extra = ""
        if prog._uplan_host is not None:
            eff_u = prog._uplan_host.padding_efficiency()
            eff_i = prog._iplan_host.padding_efficiency()
            extra = f"  pad-eff u={eff_u:.2f} i={eff_i:.2f}"
        print(f"{label:22s} {dt * 1e3:9.1f} ms/sweep  "
              f"{b['per_sweep_total'] / 2**20:8.2f} MiB/shard/sweep"
              f"  (build+compile {t_build:.1f}s){extra}")


if __name__ == "__main__":
    main()
