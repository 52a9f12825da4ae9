"""Worker script for the 2-process multi-host tests (SURVEY.md §4.2-6, §5).

Launched as a subprocess by test_multihost.py with:
  python multihost_worker.py <coordinator> <num_procs> <proc_id> <outdir>
      [--crash-after-sweep N] [--resume] [--model imc] [--scanned]
      [--exchange MODE] [--global-devices N]

``--global-devices N`` (default 8) sets the GLOBAL device count; each
process gets N/num_procs virtual CPU devices. A resume run may use a
DIFFERENT global device count than the run that wrote the checkpoint —
that is the cross-mesh-shape restore path (SURVEY.md §5 checkpoint row):
factors restore as host arrays and re-place onto the current mesh.
``--scanned`` with crash/resume runs the whole-fit lax.scan program in
segments (fit N sweeps as ONE device program, checkpoint, crash; resume
runs the remaining sweeps as one more scan).

Runs jax.distributed over CPU devices (4 virtual per process -> an 8-device
global mesh), fits sharded ALS on a deterministic tiny problem, and writes
its final factors (process 0) to <outdir>/result.npz. With
--crash-after-sweep N it checkpoints every sweep and hard-exits after sweep
N (fault injection); with --resume it restores from the newest checkpoint
and finishes the remaining sweeps.
"""

import os
import sys

coordinator, num_procs, proc_id, outdir = (
    sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])
crash_after = None
if "--crash-after-sweep" in sys.argv:
    crash_after = int(sys.argv[sys.argv.index("--crash-after-sweep") + 1])
resume = "--resume" in sys.argv
model_kind = "als"
if "--model" in sys.argv:
    model_kind = sys.argv[sys.argv.index("--model") + 1]
exchange = "allgather"
if "--exchange" in sys.argv:
    exchange = sys.argv[sys.argv.index("--exchange") + 1]
global_devices = 8
if "--global-devices" in sys.argv:
    global_devices = int(sys.argv[sys.argv.index("--global-devices") + 1])

os.environ["JAX_PLATFORMS"] = "cpu"
# exactly global_devices devices in total: strip any inherited force flag
_flags = [f for f in os.environ.get("XLA_FLAGS", "").split()
          if "xla_force_host_platform_device_count" not in f]
_flags.append("--xla_force_host_platform_device_count="
              f"{global_devices // num_procs}")
os.environ["XLA_FLAGS"] = " ".join(_flags)

import numpy as np  # noqa: E402
import jax  # noqa: E402

jax.distributed.initialize(coordinator_address=coordinator,
                           num_processes=num_procs, process_id=proc_id)
assert jax.device_count() == global_devices, jax.devices()

from recommendation_models_tpu.config import SolveConfig  # noqa: E402
from recommendation_models_tpu.data.layout import (  # noqa: E402
    build_layout, csr_arrays, layout_from_coo, shard_layout)
from recommendation_models_tpu.parallel.mesh import get_mesh, to_host  # noqa: E402
from recommendation_models_tpu.parallel.sharded_als import (  # noqa: E402
    ShardedALSProgram)
from recommendation_models_tpu.utils.checkpoint import (  # noqa: E402
    load_latest, save_checkpoint)

if model_kind == "imc":
    # IMC multihost coverage (SURVEY.md N8): sharded fit with
    # make_array_from_callback placement + checkpoint/crash/resume, same
    # harness shape as the ALS path below.
    from recommendation_models_tpu.data.synthetic import (
        synthetic_imc_ratings, synthetic_side_features)
    from recommendation_models_tpu.models.imc import IMC

    X, Y = synthetic_side_features(48, 40, d_user=10, d_item=8, seed=1)
    iu, ii, ir, _, _ = synthetic_imc_ratings(X, Y, n_obs=1200, rank=4,
                                             noise=0.02, seed=2)
    rng_w = np.random.default_rng(7)
    W0 = 0.1 * rng_w.standard_normal((10, 4)).astype(np.float32)
    H0 = 0.1 * rng_w.standard_normal((8, 4)).astype(np.float32)
    total_sweeps = 4
    kw = dict(rank=4, reg=0.1, cg_iters=20, n_shards=jax.device_count())
    ckpt_dir = os.path.join(outdir, "ckpt")
    if resume:
        m = IMC(**kw, n_sweeps=total_sweeps, checkpoint_dir=ckpt_dir,
                checkpoint_every=1)
        step = m.resume()
        m.n_sweeps = total_sweeps - step
        m.fit((iu, ii, ir), X, Y, W0=m.W_, H0=m.H_)
    elif crash_after is not None:
        m = IMC(**kw, n_sweeps=crash_after, checkpoint_dir=ckpt_dir,
                checkpoint_every=1)
        m.fit((iu, ii, ir), X, Y, W0=W0, H0=H0)
        os._exit(17)      # fault injection: hard exit after the checkpoint
    else:
        m = IMC(**kw, n_sweeps=total_sweeps).fit((iu, ii, ir), X, Y,
                                                 W0=W0, H0=H0)
    if proc_id == 0:
        np.savez(os.path.join(outdir, "result.npz"),
                 W=m.W_, H=m.H_, obj=m.history_[-1])
    print(f"proc {proc_id} done obj={m.history_[-1]:.6f}", flush=True)
    sys.exit(0)

# deterministic tiny problem (same on all processes)
rng = np.random.default_rng(0)
n_users, n_items, rank, n_sweeps = 48, 40, 5, 4
mask = rng.random((n_users, n_items)) < 0.3
R = np.where(mask, rng.uniform(1, 5, mask.shape), 0.0).astype(np.float32)
indptr, indices, data, _, _ = csr_arrays(R)
rows = np.repeat(np.arange(n_users), np.diff(indptr))

if model_kind == "hybrid2d":
    # observation-parallel 2-D program across the process (DCN) boundary:
    # each process is one virtual slice; make_array_from_callback places
    # only addressable shards, so this is the real multi-host path.
    from recommendation_models_tpu.config import DataConfig
    from recommendation_models_tpu.parallel.hybrid_als import (
        HybridALSProgram)
    from recommendation_models_tpu.parallel.mesh import get_hybrid_mesh

    dcfg = DataConfig(dense_whales=False, hot_cols=0)
    S = jax.device_count() // num_procs          # shards per slice
    mesh = get_hybrid_mesh(jax.device_count(), num_slices=num_procs)
    cfg = SolveConfig(rank=rank, reg=0.2, solver="xla",
                      compute_dtype="float32")
    prog = HybridALSProgram(
        shard_layout(build_layout(indptr, indices, data, n_users, n_items,
                                  config=dcfg), S),
        shard_layout(layout_from_coo(rows, indices, data, n_users, n_items,
                                     transpose=True, config=dcfg), S),
        mesh, cfg)
    if "--scanned" in sys.argv:
        # 2-D topology scan-mode fit with fault injection (VERDICT r4
        # task 8): segmented make_fit + checkpoint + crash/resume, same
        # contract as the 1-D scanned block below.
        ckpt_dir = os.path.join(outdir, "ckpt")
        if resume:
            step, state = load_latest(ckpt_dir)
            U, V = prog.place_factors(state["U"][:n_users],
                                      state["V"][:n_items])
            U, V, hist, _ = prog.make_fit(n_sweeps - step)(U, V)
        elif crash_after is not None:
            U, V = prog.init_factors(seed=3, init_scale=0.1)
            U, V, hist, _ = prog.make_fit(crash_after)(U, V)
            Uh, Vh = to_host(U)[:n_users], to_host(V)[:n_items]
            save_checkpoint(ckpt_dir, step=crash_after,
                            state=dict(U=Uh, V=Vh))
            os._exit(17)
        else:
            U, V = prog.init_factors(seed=3, init_scale=0.1)
            U, V, hist, _ = prog.make_fit(n_sweeps)(U, V)
        sse = float(np.asarray(hist)[-1])
    else:
        U, V = prog.init_factors(seed=3, init_scale=0.1)
        for _ in range(n_sweeps):
            U, V = prog.sweep(U, V)
        sse = float(prog.train_sse(U, V))
    Uh, Vh = to_host(U)[:n_users], to_host(V)[:n_items]
    if proc_id == 0:
        np.savez(os.path.join(outdir, "result.npz"), U=Uh, V=Vh, sse=sse)
    print(f"proc {proc_id} done sse={sse:.6f}", flush=True)
    sys.exit(0)

n_shards = jax.device_count()
mesh = get_mesh(n_shards)
cfg = SolveConfig(rank=rank, reg=0.2, solver="xla")
# compact exchanges need layouts without dense/hot blocks
from recommendation_models_tpu.config import DataConfig  # noqa: E402
dcfg = (DataConfig(dense_whales=False, hot_cols=0)
        if exchange != "allgather" else None)
prog = ShardedALSProgram(
    shard_layout(build_layout(indptr, indices, data, n_users, n_items,
                              config=dcfg), n_shards),
    shard_layout(layout_from_coo(rows, indices, data, n_users, n_items,
                                 transpose=True, config=dcfg), n_shards),
    mesh, cfg, exchange=exchange,
    head=8 if exchange == "hybrid" else 0)

if "--scanned" in sys.argv:
    # whole fit = ONE jitted device program across both processes
    # (make_fit: lax.scan over sweeps, SSE riding the item half's solves).
    # Crash/resume runs the scan in SEGMENTS: fit N sweeps as one program,
    # checkpoint the host-staged tables, hard-exit; the resume process
    # re-places onto ITS mesh (possibly a different shard count) and runs
    # the remaining sweeps as one more scan (VERDICT r4 task 8).
    ckpt_dir = os.path.join(outdir, "ckpt")
    if resume:
        step, state = load_latest(ckpt_dir)
        U, V = prog.place_factors(state["U"][:n_users],
                                  state["V"][:n_items])
        U, V, hist, n_done = prog.make_fit(n_sweeps - step)(U, V)
    elif crash_after is not None:
        U, V = prog.init_factors(seed=3, init_scale=0.1)
        U, V, hist, n_done = prog.make_fit(crash_after)(U, V)
        Uh, Vh = to_host(U)[:n_users], to_host(V)[:n_items]
        save_checkpoint(ckpt_dir, step=crash_after, state=dict(U=Uh, V=Vh))
        os._exit(17)   # fault injection mid-fit, after the collective save
    else:
        U, V = prog.init_factors(seed=3, init_scale=0.1)
        U, V, hist, n_done = prog.make_fit(n_sweeps)(U, V)
    sse = float(np.asarray(hist)[-1])
    Uh, Vh = to_host(U)[:n_users], to_host(V)[:n_items]
    if proc_id == 0:
        np.savez(os.path.join(outdir, "result.npz"), U=Uh, V=Vh, sse=sse)
    print(f"proc {proc_id} done sse={sse:.6f}", flush=True)
    sys.exit(0)

ckpt_dir = os.path.join(outdir, "ckpt")
start_sweep = 0
if resume:
    step, state = load_latest(ckpt_dir)
    U, V = prog.place_factors(state["U"][:n_users], state["V"][:n_items])
    start_sweep = step
else:
    U, V = prog.init_factors(seed=3, init_scale=0.1)

for s in range(start_sweep, n_sweeps):
    U, V = prog.sweep(U, V)
    Uh, Vh = to_host(U)[:n_users], to_host(V)[:n_items]
    if crash_after is not None:
        # orbax save is a cross-process collective: every process calls it
        save_checkpoint(ckpt_dir, step=s + 1, state=dict(U=Uh, V=Vh))
    if crash_after is not None and s + 1 >= crash_after:
        # fault injection: hard exit mid-training (no cleanup, no barrier)
        os._exit(17)

sse = float(prog.train_sse(U, V))
# to_host is a cross-process collective: EVERY process must call it
Uh, Vh = to_host(U)[:n_users], to_host(V)[:n_items]
if proc_id == 0:
    np.savez(os.path.join(outdir, "result.npz"), U=Uh, V=Vh, sse=sse)
print(f"proc {proc_id} done sse={sse:.6f}", flush=True)
