"""Profile one half-sweep on the real TPU and print the per-op time table.

Usage: python scripts/profile_half.py [user|item]  (default item)
Env: ABL_SCALE (ml25m), ABL_RANK (64), ABL_CACHE_DIR (/tmp/rmtpu_abl_cache),
PROF_DIR (/tmp/rmtpu_prof).

Parses the xplane.pb directly (the tensorboard_plugin_profile converter is
broken in this image) and aggregates device-lane event durations by op name.
"""

from __future__ import annotations

import glob
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from bench import SCALES
from recommendation_models_tpu.config import SolveConfig
from recommendation_models_tpu.data.layout_cache import load_layout
from recommendation_models_tpu.ops.pallas.cholesky import block_batch
from recommendation_models_tpu.solver.als_sweep import (
    device_buckets, half_sweep)


def main():
    side = sys.argv[1] if len(sys.argv) > 1 else "item"
    scale = os.environ.get("ABL_SCALE", "ml25m")
    rank = int(os.environ.get("ABL_RANK", "64"))
    cache = os.environ.get("ABL_CACHE_DIR", "/tmp/rmtpu_abl_cache")
    prof_dir = os.environ.get("PROF_DIR", "/tmp/rmtpu_prof")
    n_users, n_items, _ = SCALES[scale]

    path = os.path.join(cache, f"{scale}_{side}.npz")
    try:
        layout = load_layout(path)
    except Exception:
        from recommendation_models_tpu.data.layout import layout_from_coo
        from recommendation_models_tpu.data.layout_cache import save_layout
        from recommendation_models_tpu.data.synthetic import synthetic_ratings
        users, items, ratings = synthetic_ratings(
            n_users, n_items, SCALES[scale][2], rank=16, seed=0)
        os.makedirs(cache, exist_ok=True)
        layout = layout_from_coo(users, items, ratings, n_users, n_items,
                                 transpose=(side == "item"))
        save_layout(path, layout)
    cfg = SolveConfig(rank=rank, reg=0.1, solver="auto", compute_dtype="auto")
    bs = device_buckets(layout, block_batch(rank))
    n_rows = n_users if side == "user" else n_items
    n_opp = n_items if side == "user" else n_users

    rng = np.random.default_rng(0)
    T = jnp.asarray(0.01 * rng.standard_normal((n_opp, rank)), jnp.float32)

    jfn = jax.jit(lambda t, b: half_sweep(t, b, n_rows, cfg))
    np.asarray(jfn(T, bs)).ravel()[:1]  # compile + warm
    print("# warm done", file=sys.stderr)

    with jax.profiler.trace(prof_dir):
        out = jfn(T, bs)
        np.asarray(out).ravel()[:1]

    # ---- parse the newest xplane.pb --------------------------------------
    paths = sorted(glob.glob(os.path.join(prof_dir, "**", "*.xplane.pb"),
                             recursive=True), key=os.path.getmtime)
    if not paths:
        print("no xplane.pb produced", file=sys.stderr)
        return
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    space = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        space.ParseFromString(f.read())

    for plane in space.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name.lower():
            continue
        meta = {k: v.name for k, v in plane.event_metadata.items()}
        by_op = defaultdict(float)
        lane_total = defaultdict(float)
        for line in plane.lines:
            for ev in line.events:
                name = meta.get(ev.metadata_id, str(ev.metadata_id))
                dur = ev.duration_ps / 1e9  # ms
                by_op[(line.name, name)] += dur
                lane_total[line.name] += dur
        print(f"== plane: {plane.name}")
        for lane, tot in sorted(lane_total.items(), key=lambda kv: -kv[1]):
            print(f"-- lane {lane}: {tot:.2f} ms total")
            ops = [(n, d) for (l, n), d in by_op.items() if l == lane]
            for n, d in sorted(ops, key=lambda kv: -kv[1])[:40]:
                print(f"   {d:9.3f} ms  {n[:110]}")


if __name__ == "__main__":
    main()
