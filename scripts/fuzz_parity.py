"""Randomized differential fuzz: ALS estimator vs the reference-faithful
oracle across the config space (SURVEY.md §4.2-1's parity backbone, driven
wide). Each trial draws a random problem shape + estimator config (rank,
objective, reg-by-degree, bucket policy, hot/dense blocks, shard count) and
checks the one-sweep factors and multi-sweep RMSE trajectory against
OracleALS with the same init.

CPU-only by design (XLA anchor path; the TPU kernels are covered by
interpret-mode parity + scripts/tpu_smoke.py). Run:

    PYTHONPATH= XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    JAX_PLATFORMS=cpu python scripts/fuzz_parity.py [n_trials] [seed]

Exits non-zero on the first mismatch, printing the full config for replay.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import scipy.sparse as sp


def one_trial(rng: np.random.Generator, trial: int) -> str:
    from recommendation_models_tpu.models.als import ALS
    from recommendation_models_tpu.oracle.als_numpy import OracleALS

    n_users = int(rng.integers(3, 120))
    n_items = int(rng.integers(3, 100))
    density = float(rng.uniform(0.02, 0.6))
    rank = int(rng.integers(1, 13))
    alpha = None if rng.random() < 0.5 else float(rng.uniform(0.1, 20))
    reg = float(rng.uniform(0.01, 2.0))
    rbd = bool(rng.random() < 0.3)
    n_shards = int(rng.choice([1, 1, 1, 2, 4, 8]))
    cfg = dict(
        rank=rank, reg=reg, alpha=alpha, reg_by_degree=rbd,
        min_bucket=int(rng.choice([8, 8, 16])),
        max_bucket=int(rng.choice([32, 64, 4096])),
        bucket_growth=float(rng.choice([1.12, 1.25, 2.0])),
        hot_cols=int(rng.choice([0, 0, 8, 32])),
        dense_min_degree=int(rng.choice([8, 24, 512])),
        chunk=int(rng.choice([16, 512])),
        gather_budget_mb=int(rng.choice([0, 1, 64])),
        seed=trial,
    )
    tag = (f"trial {trial}: {n_users}x{n_items} d={density:.2f} {cfg} "
           f"shards={n_shards}")

    mask = rng.random((n_users, n_items)) < density
    # guarantee at least one observation
    mask[int(rng.integers(n_users)), int(rng.integers(n_items))] = True
    # HALF-STAR ratings (the MovieLens domain): the hot/dense blocks store
    # values as f16 slabs, exact for half-stars by design (data/layout.py)
    # — arbitrary floats would fuzz the f16 rounding, not the algorithms
    R = np.where(mask, rng.integers(1, 11, mask.shape) / 2.0, 0.0
                 ).astype(np.float32)
    Rs = sp.csr_matrix(R)
    U0 = (0.1 * rng.standard_normal((n_users, rank))).astype(np.float32)
    V0 = (0.1 * rng.standard_normal((n_items, rank))).astype(np.float32)

    o = OracleALS(rank=rank, reg=reg, alpha=alpha, reg_by_degree=rbd,
                  n_sweeps=3)
    o.fit(Rs, U0=U0, V0=V0)

    kw = dict(cfg)
    if n_shards > 1:
        kw.update(n_shards=n_shards, platform="cpu",
                  exchange=str(rng.choice(["allgather", "all_to_all"])))
        # compact exchange cannot serve dense/hot global-column blocks
        if kw["exchange"] == "all_to_all":
            kw.update(hot_cols=0, dense_min_degree=None)
            kw["max_bucket"] = 4096
    m = ALS(n_sweeps=3, **kw)
    m.fit(Rs, U0=U0, V0=V0)

    scale = max(np.abs(o.U_).max(), 1.0)
    # trajectory parity: same algorithm, f32 vs f64 — loose but
    # order-of-magnitude-breakage-detecting tolerances (conditioning
    # amplifies across sweeps; see scripts/tpu_smoke.py rationale)
    hist_o = np.asarray(o.history_)
    hist_m = np.asarray(m.history_)
    # floor the denominator at 1e-3: near-interpolation fits (tiny reg +
    # over-parameterized rank) drive the true RMSE toward 0, where the
    # single-device path's solve-identity SSE (r2 - x.rhs - reg||x||^2)
    # loses it to f32 cancellation — a documented tradeoff of keeping the
    # residual free (solver/als_sweep.py), not a factor error (the factors
    # and the sharded masked_sse both match the oracle there)
    dh = np.abs(hist_o - hist_m).max() / max(hist_o[-1], 1e-3)
    assert dh < 5e-2, f"history diverged ({dh:.3e})\n{tag}\n{hist_o}\n{hist_m}"
    assert np.isfinite(m.U_).all() and np.isfinite(m.V_).all(), tag
    # single-sweep factor parity (tight: one sweep limits amplification)
    o1 = OracleALS(rank=rank, reg=reg, alpha=alpha, reg_by_degree=rbd,
                   n_sweeps=1).fit(Rs, U0=U0, V0=V0)
    m1 = ALS(n_sweeps=1, **kw).fit(Rs, U0=U0, V0=V0)
    du = np.abs(m1.U_ - o1.U_).max() / scale
    assert du < 5e-3, f"1-sweep U diverged ({du:.3e})\n{tag}"

    # serving parity on the fitted model: exact top-k, both exclusion modes
    uq = np.arange(min(n_users, 5))
    sc, it = m.recommend(uq, n=min(4, n_items), exclude_seen=False,
                         method="exact")
    s_ref = m.U_[uq] @ m.V_.T
    np.testing.assert_allclose(np.asarray(sc)[:, 0], s_ref.max(1),
                               rtol=1e-4, atol=1e-5, err_msg=tag)
    sc_x, it_x = m.recommend(uq, n=min(4, n_items), exclude_seen=True,
                             method="exact")
    s_excl = s_ref.copy()
    for i, u in enumerate(uq):
        s_excl[i, Rs[u].indices] = -np.inf
    np.testing.assert_allclose(np.asarray(sc_x)[:, 0], s_excl.max(1),
                               rtol=1e-4, atol=1e-5, err_msg=tag)
    return tag


def one_imc_trial(rng: np.random.Generator, trial: int) -> str:
    from recommendation_models_tpu.models.imc import IMC
    from recommendation_models_tpu.oracle.imc_numpy import OracleIMC

    n_users = int(rng.integers(4, 80))
    n_items = int(rng.integers(4, 70))
    d_u = int(rng.integers(2, 14))
    d_i = int(rng.integers(2, 12))
    rank = int(rng.integers(1, min(d_u, d_i) + 1))
    reg = float(rng.uniform(0.02, 1.0))
    cg = int(rng.integers(10, 40))
    n_obs = int(rng.integers(n_users, n_users * n_items // 2 + n_users))
    n_shards = int(rng.choice([1, 1, 4, 8]))
    tag = (f"imc trial {trial}: {n_users}x{n_items} d={d_u}/{d_i} r={rank} "
           f"reg={reg:.3f} cg={cg} obs={n_obs} shards={n_shards}")

    X = rng.standard_normal((n_users, d_u)).astype(np.float32)
    Y = rng.standard_normal((n_items, d_i)).astype(np.float32)
    users = rng.integers(0, n_users, n_obs).astype(np.int32)
    items = rng.integers(0, n_items, n_obs).astype(np.int32)
    # dedup pairs
    key = users.astype(np.int64) * n_items + items
    _, first = np.unique(key, return_index=True)
    users, items = users[first], items[first]
    ratings = (0.5 * rng.standard_normal(users.shape[0])).astype(np.float32)
    W0 = (0.1 * rng.standard_normal((d_u, rank))).astype(np.float32)
    H0 = (0.1 * rng.standard_normal((d_i, rank))).astype(np.float32)

    o = OracleIMC(rank=rank, reg=reg, n_sweeps=3, cg_iters=cg).fit(
        users, items, ratings, X, Y, W0=W0, H0=H0)
    kw = dict(rank=rank, reg=reg, n_sweeps=3, cg_iters=cg)
    if n_shards > 1:
        kw.update(n_shards=n_shards, platform="cpu")
    m = IMC(**kw).fit((users, items, ratings), X, Y, W0=W0, H0=H0)
    if reg >= 0.1:
        # well-conditioned: trajectories must track the oracle
        dh = (np.abs(np.asarray(o.history_) - np.asarray(m.history_)).max()
              / max(abs(o.history_[-1]), 1e-6))
        assert dh < 5e-2, f"objective diverged ({dh:.3e})\n{tag}"
    else:
        # near-singular subproblems (tiny reg): f32 CG legitimately takes a
        # different trajectory than the f64 oracle (loss of orthogonality
        # past the exact-termination dimension — seen at reg~0.026, where
        # ours lands at a LOWER objective and single/sharded agree to 4
        # digits). Require we optimize at least as well, not the same path.
        assert m.history_[-1] <= o.history_[-1] * 1.05 + 1e-3, (
            f"worse objective {m.history_[-1]:.4f} vs oracle "
            f"{o.history_[-1]:.4f}\n{tag}")
    assert np.isfinite(m.W_).all() and np.isfinite(m.H_).all(), tag
    # serving: exact top-k on the projected factors, both exclusion modes
    uq = np.arange(min(n_users, 4))
    nq = min(3, n_items)
    sc, _ = m.recommend(uq, n=nq, exclude_seen=False, method="exact")
    s_ref = (X[uq] @ m.W_) @ (Y @ m.H_).T
    np.testing.assert_allclose(np.asarray(sc)[:, 0], s_ref.max(1),
                               rtol=1e-4, atol=1e-5, err_msg=tag)
    _, it_x = m.recommend(uq, n=nq, exclude_seen=True, method="exact")
    for i, u in enumerate(uq):
        seen = set(items[users == u].tolist())
        if n_items - len(seen) >= nq:
            assert not set(np.asarray(it_x)[i].tolist()) & seen, tag
    return tag


def one_hybrid2d_trial(rng: np.random.Generator, trial: int) -> str:
    """Observation-parallel 2-D program vs the single-device sweep across
    random shapes/configs (stresses split_layout_slices' round-robin deal,
    the dcn gram psum, and the row-block scan bounding)."""
    import jax.numpy as jnp
    from recommendation_models_tpu.config import DataConfig, SolveConfig
    from recommendation_models_tpu.data.layout import (build_layout,
                                                       csr_arrays,
                                                       layout_from_coo,
                                                       shard_layout)
    from recommendation_models_tpu.parallel.hybrid_als import HybridALSProgram
    from recommendation_models_tpu.parallel.mesh import get_hybrid_mesh
    from recommendation_models_tpu.solver.als_sweep import (device_buckets,
                                                            make_sweep_fns)

    n_users = int(rng.integers(6, 90))
    n_items = int(rng.integers(6, 80))
    density = float(rng.uniform(0.05, 0.5))
    rank = int(rng.integers(1, 9))
    D, S = [(2, 4), (4, 2), (2, 2), (8, 1)][int(rng.integers(4))]
    cfg = SolveConfig(rank=rank, reg=float(rng.uniform(0.05, 1.0)),
                      alpha=None if rng.random() < 0.5
                      else float(rng.uniform(0.5, 10)),
                      reg_by_degree=bool(rng.random() < 0.3),
                      chunk=int(rng.choice([16, 512])),
                      gather_budget_mb=int(rng.choice([0, 1])))
    dcfg = DataConfig(dense_whales=False, hot_cols=0,
                      min_bucket=int(rng.choice([8, 16])),
                      max_bucket=int(rng.choice([32, 4096])),
                      bucket_growth=float(rng.choice([1.12, 2.0])))
    tag = (f"hybrid2d trial {trial}: {n_users}x{n_items} d={density:.2f} "
           f"r={rank} D={D} S={S} alpha={cfg.alpha} rbd={cfg.reg_by_degree}")

    mask = rng.random((n_users, n_items)) < density
    mask[int(rng.integers(n_users)), int(rng.integers(n_items))] = True
    R = np.where(mask, rng.integers(1, 11, mask.shape) / 2.0, 0.0
                 ).astype(np.float32)
    indptr, indices, data, _, _ = csr_arrays(R)
    ul = build_layout(indptr, indices, data, n_users, n_items, dcfg)
    rows = np.repeat(np.arange(n_users), np.diff(indptr))
    il = layout_from_coo(rows, indices, data, n_users, n_items, dcfg,
                         transpose=True)
    U0 = (0.1 * rng.standard_normal((n_users, rank))).astype(np.float32)
    V0 = (0.1 * rng.standard_normal((n_items, rank))).astype(np.float32)

    sweep, train_sse = make_sweep_fns(device_buckets(ul), device_buckets(il),
                                      n_users, n_items, cfg)
    U = jnp.asarray(U0)
    V = jnp.asarray(V0)
    for _ in range(2):
        U, V = sweep(U, V)
    sse_ref = float(train_sse(U, V))

    mesh = get_hybrid_mesh(D * S, num_slices=D, platform="cpu")
    prog = HybridALSProgram(shard_layout(ul, S), shard_layout(il, S),
                            mesh, cfg)
    Uh, Vh = prog.place_factors(U0, V0)
    for _ in range(2):
        Uh, Vh = prog.sweep(Uh, Vh)
    sse_h = float(prog.train_sse(Uh, Vh))
    scale = max(np.abs(np.asarray(U)).max(), 1.0)
    np.testing.assert_allclose(np.asarray(Uh)[:n_users], np.asarray(U),
                               rtol=5e-4, atol=5e-5 * scale, err_msg=tag)
    np.testing.assert_allclose(sse_h, sse_ref, rtol=2e-4, atol=1e-5,
                               err_msg=tag)
    return tag


def one_parser_trial(rng: np.random.Generator, trial: int) -> str:
    """Data-plane round trip: write a random ratings file in a random
    MovieLens vintage format (tab / '::' / csv, optional header/CRLF/no
    trailing newline, shuffled sparse original ids), parse through the
    native C++ scanner path, and check triplets + vocab against ground
    truth."""
    import tempfile
    from recommendation_models_tpu.data.movielens import load_ratings_file

    n_users = int(rng.integers(1, 60))
    n_items = int(rng.integers(1, 50))
    n_obs = int(rng.integers(1, 400))
    fmt = ["u.data", "ratings.dat", "ratings.csv"][int(rng.integers(3))]
    header = fmt == "ratings.csv"
    crlf = bool(rng.random() < 0.3)
    no_final_nl = bool(rng.random() < 0.3)
    # sparse, shuffled original id spaces (parsers must densify)
    uvocab = np.sort(rng.choice(10_000, n_users, replace=False)) + 1
    ivocab = np.sort(rng.choice(50_000, n_items, replace=False)) + 1
    u = rng.integers(0, n_users, n_obs)
    i = rng.integers(0, n_items, n_obs)
    r = rng.integers(1, 11, n_obs) / 2.0
    tag = (f"parser trial {trial}: {fmt} obs={n_obs} {n_users}x{n_items} "
           f"crlf={crlf} nonl={no_final_nl}")

    sep = {"u.data": "\t", "ratings.dat": "::", "ratings.csv": ","}[fmt]
    eol = "\r\n" if crlf else "\n"
    lines = []
    if header:
        lines.append("userId,movieId,rating,timestamp")
    for k in range(n_obs):
        rat = f"{r[k]:g}" if fmt == "ratings.csv" else (
            str(int(r[k])) if r[k] == int(r[k]) else f"{r[k]:g}")
        lines.append(sep.join([str(uvocab[u[k]]), str(ivocab[i[k]]),
                               rat, str(800000000 + k)]))
    content = eol.join(lines) + ("" if no_final_nl else eol)
    suffix = {"u.data": ".data", "ratings.dat": ".dat",
              "ratings.csv": ".csv"}[fmt]
    with tempfile.NamedTemporaryFile("w", suffix=suffix,
                                     delete=False) as f:
        f.write(content)
        path = f.name
    try:
        d = load_ratings_file(path, cache=False)
    finally:
        os.unlink(path)
    assert d["ratings"].shape[0] == n_obs, tag
    # vocab maps dense -> original ids; round-trip every observation
    np.testing.assert_array_equal(d["user_vocab"][d["users"]], uvocab[u],
                                  err_msg=tag)
    np.testing.assert_array_equal(d["item_vocab"][d["items"]], ivocab[i],
                                  err_msg=tag)
    np.testing.assert_allclose(d["ratings"], r, rtol=0, atol=1e-6,
                               err_msg=tag)
    assert d["n_users"] == np.unique(u).shape[0], tag
    assert d["n_items"] == np.unique(i).shape[0], tag
    return tag


def main() -> int:
    n_trials = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    model = os.environ.get("FUZZ_MODEL", "als")
    fn = {"als": one_trial, "imc": one_imc_trial,
          "hybrid2d": one_hybrid2d_trial, "parser": one_parser_trial}[model]
    rng = np.random.default_rng(seed)
    t0 = time.time()
    for t in range(n_trials):
        tag = fn(rng, t)
        print(f"ok {tag[:110]}  [{time.time() - t0:.0f}s]", flush=True)
    print(f"FUZZ PASS ({model}): {n_trials} trials, {time.time() - t0:.0f}s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
