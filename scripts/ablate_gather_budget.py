"""Whole-half-sweep timing vs SolveConfig.gather_budget_mb.

Motivation: profile_half shows item-half TOP-LEVEL bucket gathers running at
~90M rows/s while the user half's row-block-SCANNED gathers run several times
faster per slot; probe_split_gather confirms scanned gather+gram sustains
~320M rows/s at the same shapes. Lowering the budget forces big buckets
through the row-block lax.scan — this measures whether scan pipelining wins
on the whole half-sweep (the only number we trust, per docs/PERF.md).

Env: ABL_SCALE (ml25m), ABL_RANK (64), ABL_SIDE (item), ABL_ITERS (5),
ABL_CACHE_DIR (/tmp/rmtpu_abl_cache), ABL_BUDGETS (256,64,24,8).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

from bench import SCALES
from recommendation_models_tpu.config import SolveConfig
from recommendation_models_tpu.data.layout_cache import load_layout, save_layout
from recommendation_models_tpu.ops.pallas.cholesky import block_batch
from recommendation_models_tpu.solver.als_sweep import device_buckets, half_sweep
from scripts.ablate_epoch import timed


def main():
    side = os.environ.get("ABL_SIDE", "item")
    scale = os.environ.get("ABL_SCALE", "ml25m")
    rank = int(os.environ.get("ABL_RANK", "64"))
    iters = int(os.environ.get("ABL_ITERS", "5"))
    cache = os.environ.get("ABL_CACHE_DIR", "/tmp/rmtpu_abl_cache")
    budgets = [int(b) for b in
               os.environ.get("ABL_BUDGETS", "256,64,24,8").split(",")]
    n_users, n_items, _ = SCALES[scale]

    path = os.path.join(cache, f"{scale}_{side}.npz")
    try:
        layout = load_layout(path)
    except Exception:
        from recommendation_models_tpu.data.layout import layout_from_coo
        from recommendation_models_tpu.data.synthetic import synthetic_ratings
        users, items, ratings = synthetic_ratings(
            n_users, n_items, SCALES[scale][2], rank=16, seed=0)
        os.makedirs(cache, exist_ok=True)
        layout = layout_from_coo(users, items, ratings, n_users, n_items,
                                 transpose=(side == "item"))
        save_layout(path, layout)

    bs = device_buckets(layout, block_batch(rank))
    n_rows = n_users if side == "user" else n_items
    n_opp = n_items if side == "user" else n_users
    rng = np.random.default_rng(0)
    T = jnp.asarray(0.01 * rng.standard_normal((n_opp, rank)), jnp.float32)

    for mb in budgets:
        cfg = SolveConfig(rank=rank, reg=0.1, solver="auto",
                          compute_dtype="auto", gather_budget_mb=mb)
        timed(lambda t, b: half_sweep(t, b, n_rows, cfg), T, bs,
              n_iters=iters, label=f"{side} half, gather_budget={mb}MB")


if __name__ == "__main__":
    main()
