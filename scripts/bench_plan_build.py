"""Wall-clock of the one-time sharded-exchange preprocessing at large shard
counts (VERDICT r2 weak item 4): the BASELINE.md byte tables quote S up to
256, but the plan-build cost at those S was never recorded. Measures
shard_layout + build_exchange_plan (tail-only and hybrid head=1024) at
S in {8, 32, 128, 256} on ML-25M shapes. Host-only NumPy work — run with
JAX_PLATFORMS=cpu; results go into BASELINE.md 'Exchange-plan build cost'.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from recommendation_models_tpu.config import DataConfig
from recommendation_models_tpu.data.layout import layout_from_coo, shard_layout
from recommendation_models_tpu.data.synthetic import synthetic_ratings
from recommendation_models_tpu.parallel.exchange import build_exchange_plan

N_USERS, N_ITEMS, N_OBS = 162_541, 62_423, 25_000_000


def main():
    dcfg = DataConfig(dense_whales=False, hot_cols=0)
    t0 = time.perf_counter()
    users, items, ratings = synthetic_ratings(
        N_USERS, N_ITEMS, N_OBS, rank=16, seed=0)
    ul = layout_from_coo(users, items, ratings, N_USERS, N_ITEMS, config=dcfg)
    il = layout_from_coo(users, items, ratings, N_USERS, N_ITEMS,
                         config=dcfg, transpose=True)
    print(f"# layout build {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    shard_counts = [int(s) for s in
                    os.environ.get("PLAN_S", "8,32,128,256").split(",")]
    for S in shard_counts:
        t0 = time.perf_counter()
        uls = shard_layout(ul, S)
        ils = shard_layout(il, S)
        t_shard = time.perf_counter() - t0
        row = {"S": S, "shard_layout_s": round(t_shard, 2)}
        for name, head in (("tail_only", 0), ("hybrid_h1024", 1024)):
            t0 = time.perf_counter()
            up = build_exchange_plan(uls, col_shard_size=ils.rows_per_shard,
                                     head=head)
            ip = build_exchange_plan(ils, col_shard_size=uls.rows_per_shard,
                                     head=head)
            row[f"plan_{name}_s"] = round(time.perf_counter() - t0, 2)
            row[f"bytes_{name}_mib"] = round(
                (up.recv_bytes_per_half_sweep(64)
                 + ip.recv_bytes_per_half_sweep(64)) / 2**20, 1)
        print(json.dumps(row))


if __name__ == "__main__":
    main()
