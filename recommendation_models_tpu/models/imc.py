"""IMC — inductive matrix completion estimator (SURVEY.md §2.1 row 7, N8).

Model: ``r_ui ≈ x_u^T W H^T y_i`` with dense side-feature matrices X (users)
and Y (items); handles cold-start rows through their features. Objective
(SURVEY.md §3.3): ``½‖P_Ω(R − X W H^T Y^T)‖² + λ/2(‖W‖² + ‖H‖²)``.

TPU-native training: alternating minimization. The key identity: with
``z_i = (Y H)_i``, the W-subproblem's Hessian-apply groups by user,

  Σ_o x_o x_o^T W z_o z_o^T  =  X^T [ (X W) ⊙_rows G ]   with
  G_u = Σ_{i in Ω_u} z_i z_i^T,

so the per-user (rank x rank) grams ``G`` are accumulated ONCE per
half-update via the same padded segment-gather machinery as ALS (one nnz
gather), and every conjugate-gradient iteration is then pure dense MXU work
(two feature matmuls + a batched vec-mat) with NO nnz-dependent gathers or
scatters. This made IMC ~50x faster than the naive per-iteration
segment-sum formulation on v5e.

Sharded: users (and items, for the H update) row-shard along the 'data'
mesh axis; grams/CG run per shard with ``psum`` on the (d, k) reductions —
"IMC side-feature projections run data-parallel on the dense mesh"
(SURVEY.md [B:5]). Arrays are placed with ``make_array_from_callback`` so
the same program serves one process or a multi-host pod slice (mirrors
parallel.sharded_als).

Feature parity with ALS (SURVEY.md N8/N13): ``tol`` early stop,
checkpoint/resume every N sweeps via orbax, packed on-disk layout cache.
When no per-sweep callback is needed the whole fit stays ONE jitted
``lax.scan`` device program; tol/checkpoint/verbose switch to a per-sweep
host loop reusing one compiled length-1 program.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from recommendation_models_tpu.data.layout import csr_arrays
from recommendation_models_tpu.models.base import BaseEstimator


def _as_triplets(R) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    if isinstance(R, tuple) and len(R) == 3:
        u, i, r = R
        return (np.asarray(u, np.int32), np.asarray(i, np.int32),
                np.asarray(r, np.float32))
    indptr, indices, data, n_users, _ = csr_arrays(R)
    users = np.repeat(np.arange(n_users, dtype=np.int32), np.diff(indptr))
    return users, indices.astype(np.int32), data


def _factor_grams(Z, buckets, n_rows, chunk: int = 512,
                  gather_budget_mb: int = 0):
    """Per-row grams G (n_rows, k, k) = Σ_Ω z z^T, RHS (n_rows, k) = Σ_Ω r z,
    and Σ r² — one nnz gather, reusing the ALS padded-layout machinery.

    Big buckets are processed in ROW BLOCKS so the gathered
    (rows, chunk, k) temp stays under the HBM budget (the repo-wide
    invariant — required at ML-25M+ scale; the unbounded per-bucket
    gather OOM'd there, r4 review). Budget resolves through the same
    rank/size-aware policy as ALS (solver.als_sweep.resolve_gather_budget).
    """
    from recommendation_models_tpu.ops.gram import gram_rhs
    from recommendation_models_tpu.solver.als_sweep import (
        resolve_gather_budget)
    from recommendation_models_tpu.utils.compat import match_vma

    k = Z.shape[-1]
    # for_sse: like the SSE pass, this is a pure accumulate with no solve
    # to pipeline against — tiny blocks would only pay scan overhead
    budget_mb = resolve_gather_budget(gather_budget_mb, k, buckets,
                                      for_sse=True)
    G = jnp.zeros((n_rows, k, k), jnp.float32)
    RHS = jnp.zeros((n_rows, k), jnp.float32)
    r2 = jnp.zeros((), jnp.float32)
    for b in buckets:
        bsz, p = b["indices"].shape
        bb = max(8, (budget_mb * (1 << 20))
                 // (min(p, chunk) * k * 4) // 8 * 8)
        if bsz <= bb:
            g, r = gram_rhs(Z, b["indices"], b["mask"],
                            b["mask"] * b["values"], chunk=chunk)
            G = G.at[b["row_ids"]].add(g, mode="drop")
            RHS = RHS.at[b["row_ids"]].add(r, mode="drop")
            r2 = r2 + jnp.sum(b["mask"] * b["values"] ** 2)
            continue
        n_bb = -(-bsz // bb)
        pad = n_bb * bb - bsz
        idx_s = jnp.pad(b["indices"], ((0, pad), (0, 0))).reshape(n_bb, bb, p)
        msk_s = jnp.pad(b["mask"], ((0, pad), (0, 0))).reshape(n_bb, bb, p)
        val_s = jnp.pad(b["values"], ((0, pad), (0, 0))).reshape(n_bb, bb, p)
        rid_s = jnp.pad(b["row_ids"], (0, pad), constant_values=n_rows
                        ).reshape(n_bb, bb)

        def body(carry, xs):
            G, RHS, r2 = carry
            rid_b, idx_b, msk_b, val_b = xs
            g, r = gram_rhs(Z, idx_b, msk_b, msk_b * val_b, chunk=chunk)
            return (G.at[rid_b].add(g, mode="drop"),
                    RHS.at[rid_b].add(r, mode="drop"),
                    r2 + jnp.sum(msk_b * val_b ** 2)), None

        init = match_vma((G, RHS, r2), (Z, b["indices"]))
        (G, RHS, r2), _ = jax.lax.scan(body, init,
                                       (rid_s, idx_s, msk_s, val_s))
    return G, RHS, r2


def _solve_factor(F, Z, buckets, n_rows, M0, reg, cg_iters, psum_axis=None):
    """min_M ½Σ_Ω (f_row^T M z_col − r)² + reg/2 ‖M‖² by CG whose
    Hessian-apply is dense MXU work: F^T[(F M) ⊙_rows G] + reg M — no
    nnz-dependent gathers inside the CG loop. Returns (M, sse(M)); the
    residual at the new M is exact from the same grams (quadratic
    objective)."""
    G, RHS, r2 = _factor_grams(Z, buckets, n_rows)

    def _psum(v):
        return jax.lax.psum(v, psum_axis) if psum_axis else v

    # HIGHEST: TPU f32 dots at DEFAULT precision run as ONE bf16 pass
    # (CLAUDE.md discipline) — fine for a single gram/score pass, but CG
    # iterates against A and needs a CONSISTENT, accurate operator; the
    # per-iteration bf16 perturbation stalled convergence well above the
    # f64 oracle (measured at ML-1M-scale: train objective up to ~2x).
    HI = jax.lax.Precision.HIGHEST

    b = _psum(jnp.matmul(F.T, RHS, precision=HI))
    r2 = _psum(r2)

    def matvec(Mf):
        M = Mf.reshape(M0.shape)
        T = jnp.matmul(F, M, precision=HI)          # dense tower (MXU)
        T = jnp.einsum("ukl,uk->ul", G, T,
                       preferred_element_type=jnp.float32, precision=HI)
        return (_psum(jnp.matmul(F.T, T, precision=HI)) + reg * M).ravel()

    M = _cg(matvec, b.ravel(), M0.ravel(), cg_iters).reshape(M0.shape)
    T = jnp.matmul(F, M, precision=HI)
    quad = _psum(jnp.einsum("uk,ukl,ul->", T, G, T,
                            preferred_element_type=jnp.float32,
                            precision=HI))
    sse = r2 - 2.0 * jnp.vdot(b, M) + quad
    return M, sse


@functools.lru_cache(maxsize=64)
def _imc_program(reg, cg_iters, n_sweeps, n_users, n_items, tol=0.0):
    """Cached jitted whole-fit program (lax.scan over sweeps) so repeated
    fits with the same config/shape reuse the compilation. Returns
    (W, H, obj (n_sweeps,)) where obj = ½ sse + λ/2(‖W‖²+‖H‖²) at each
    sweep's end state.

    ``tol > 0`` switches to a device-side ``while_loop`` with the
    stopping rule |Δ objective| < tol — zero per-sweep host readbacks
    (mirrors ALS's scanned-fit design; sweeps never run leave -1 in the
    history and the host trims by the device-reported count)."""

    def one_sweep(W, H, X, Y, ub, ib):
        W, _ = _solve_factor(X, Y @ H, ub, n_users, W, reg, cg_iters)
        H, sse = _solve_factor(Y, X @ W, ib, n_items, H, reg, cg_iters)
        obj = 0.5 * sse + 0.5 * reg * (jnp.sum(W ** 2) + jnp.sum(H ** 2))
        return W, H, obj

    @jax.jit
    def fit_all(W, H, X, Y, ub, ib):
        def body(carry, _):
            W, H = carry
            W, H, obj = one_sweep(W, H, X, Y, ub, ib)
            return (W, H), obj

        (W, H), hist = jax.lax.scan(body, (W, H), None, length=n_sweeps)
        return W, H, hist, jnp.int32(n_sweeps)

    @jax.jit
    def fit_tol(W, H, X, Y, ub, ib):
        hist0 = jnp.full((n_sweeps,), -1.0, jnp.float32)

        def cond(carry):
            _, _, hist, i = carry
            prev = hist[jnp.maximum(i - 2, 0)]
            cur = hist[jnp.maximum(i - 1, 0)]
            improving = jnp.logical_or(i < 2, jnp.abs(prev - cur) >= tol)
            return jnp.logical_and(i < n_sweeps, improving)

        def body(carry):
            W, H, hist, i = carry
            W, H, obj = one_sweep(W, H, X, Y, ub, ib)
            return W, H, hist.at[i].set(obj), i + 1

        W, H, hist, i = jax.lax.while_loop(
            cond, body, (W, H, hist0, jnp.int32(0)))
        # i = sweeps actually run: the trim truth (an obj>=0 value test is
        # NOT — f32 cancellation near interpolation can round a real
        # sweep's objective slightly negative, and NaN divergence should
        # surface, not vanish — r4 review)
        return W, H, hist, i

    return fit_tol if tol > 0 else fit_all


def _cg(matvec, b, x0, iters, restart: int = 16):
    """CG with periodic TRUE-residual restarts, jit-friendly.

    In f32 the residual recurrence drifts from ``b - A x`` (loss of
    orthogonality), plateauing the solve well above what the same
    iteration count reaches in f64 — measured at ML-1M-scale IMC, the
    plateau left the train objective up to ~2x the f64 oracle's while
    matched-iteration RESTARTED f32 CG tracks it closely. Every
    ``restart`` steps the recurrence residual is replaced by the true one.

    Runs EXACTLY ``iters`` CG steps (the final block is ``iters % restart``
    long — ADVICE r3: the old version rounded up, over-running cg_iters by
    up to restart-1 steps), plus one true-residual matvec per block:
    ``ceil(iters / restart)`` extra matvecs total (~6% at restart=16).
    """
    def body(_, carry):
        x, r, p, rs = carry
        Ap = matvec(p)
        denom = jnp.vdot(p, Ap)
        a = jnp.where(denom > 0, rs / jnp.maximum(denom, 1e-30), 0.0)
        x = x + a * p
        r = r - a * Ap
        rs_new = jnp.vdot(r, r)
        beta = jnp.where(rs > 0, rs_new / jnp.maximum(rs, 1e-30), 0.0)
        p = r + beta * p
        return x, r, p, rs_new

    def restarted(x, length):
        r0 = b - matvec(x)
        return jax.lax.fori_loop(
            0, length, body, (x, r0, r0, jnp.vdot(r0, r0)))[0]

    x = x0
    done = 0
    while done < iters:
        step = min(restart, iters - done)
        x = restarted(x, step)
        done += step
    return x


def cg_matvec_count(iters: int, restart: int = 16) -> int:
    """Matvecs one ``_cg`` call performs: ``iters`` CG steps plus one
    true-residual matvec per restart block (used by the sharded traffic
    accounting)."""
    return iters + -(-iters // restart)


class IMC(BaseEstimator):
    """Inductive matrix completion with side features, sklearn-style."""

    def __init__(
        self,
        rank: int = 8,
        reg: Optional[float] = None,        # None => 0.1 (alias sentinel)
        n_sweeps: Optional[int] = None,     # None => 10 (alias sentinel)
        tol: float = 0.0,
        cg_iters: int = 50,
        seed: int = 0,
        init_scale: float = 0.1,
        n_shards: Optional[int] = None,
        num_slices: Optional[int] = None,
        platform: Optional[str] = None,
        checkpoint_dir: Optional[str] = None,
        checkpoint_every: int = 0,
        layout_cache: Optional[str] = None,
        verbose: int = 0,
        lambda_: Optional[float] = None,
        max_iter: Optional[int] = None,
    ):
        self.rank = rank
        self.reg = reg
        self.n_sweeps = n_sweeps
        self.tol = tol
        self.cg_iters = cg_iters
        self.seed = seed
        self.init_scale = init_scale
        self.n_shards = n_shards
        self.num_slices = num_slices
        self.platform = platform
        self.checkpoint_dir = checkpoint_dir
        self.checkpoint_every = checkpoint_every
        self.layout_cache = layout_cache
        self.verbose = verbose
        # reference-name aliases (see models/als.py; SURVEY.md §0 items 1-2)
        self.lambda_ = lambda_
        self.max_iter = max_iter

    # None-sentinel alias resolution shared with ALS (models.base)
    @property
    def _reg(self) -> float:
        from recommendation_models_tpu.models.base import resolve_alias
        return resolve_alias(self.reg, self.lambda_, 0.1, "reg", "lambda_")

    @property
    def _n_sweeps(self) -> int:
        from recommendation_models_tpu.models.base import resolve_alias
        return resolve_alias(self.n_sweeps, self.max_iter, 10,
                             "n_sweeps", "max_iter")

    # ------------------------------------------------------------------
    def _build_layouts(self, users, items, ratings, n_users, n_items, dcfg):
        """Both orientations' padded layouts through the packed on-disk
        cache (SURVEY.md §7 hard part 6), mirroring ALS._build_layouts."""
        from recommendation_models_tpu.data.layout import layout_from_coo
        from recommendation_models_tpu.data.layout_cache import cached_layout

        def build_user():
            return layout_from_coo(users, items, ratings, n_users, n_items,
                                   config=dcfg)

        def build_item():
            return layout_from_coo(users, items, ratings, n_users, n_items,
                                   transpose=True, config=dcfg)

        prefix = self.layout_cache
        # full-config hash + data fingerprint, mirroring models/als.py:
        # refitting the same prefix on DIFFERENT observations or with ANY
        # changed layout knob must rebuild, not silently reuse a stale
        # layout (VERDICT r2 weak item 1 / r3+r4 reviews).
        from recommendation_models_tpu.data.layout_cache import config_tag
        tag = f".imc.cfg{config_tag(dcfg)}"
        if prefix:
            from recommendation_models_tpu.data.layout_cache import (
                data_fingerprint)
            # table sizes come from X/Y row counts, NOT from the triplets
            # (ALS hashes indptr, whose length encodes n_users) — include
            # them or resized feature tables silently reuse stale layouts
            tag += "." + data_fingerprint(
                users, items, ratings,
                np.asarray([n_users, n_items], np.int64))
        return (cached_layout(f"{prefix}{tag}.user.npz" if prefix else None,
                              build_user),
                cached_layout(f"{prefix}{tag}.item.npz" if prefix else None,
                              build_item))

    def fit(self, R, X, Y, W0=None, H0=None):
        """Fit W, H on observations of R with user features X, item features Y.

        R: scipy sparse / dense matrix, or a (users, items, ratings) triplet
        tuple. X: (n_users, d_user), Y: (n_items, d_item).
        """
        if self.rank < 1:
            raise ValueError(f"rank must be >= 1, got {self.rank}")
        users, items, ratings = _as_triplets(R)
        X = jnp.asarray(X, jnp.float32)
        Y = jnp.asarray(Y, jnp.float32)
        n_users, n_items = X.shape[0], Y.shape[0]
        if users.size and (users.max() >= n_users or items.max() >= n_items):
            raise ValueError(
                f"observation ids exceed feature rows: max user "
                f"{users.max()} vs X rows {n_users}, max item {items.max()} "
                f"vs Y rows {n_items}")
        if users.size and (users.min() < 0 or items.min() < 0):
            raise ValueError(
                f"observation ids must be non-negative; got min user "
                f"{users.min()}, min item {items.min()}")

        from recommendation_models_tpu.config import DataConfig
        from recommendation_models_tpu.solver.als_sweep import device_buckets

        # IMC's gram consumer iterates gather buckets only — build without
        # the ALS dense-whale / hot-column blocks (wide buckets handle
        # whale rows here); bucket growth follows the rank-aware auto
        # policy (finer grids cut padded gather slots at low rank)
        from recommendation_models_tpu.config import bucket_growth_for_rank
        dcfg = DataConfig(dense_whales=False, hot_cols=0,
                          bucket_growth=bucket_growth_for_rank(self.rank))
        user_layout, item_layout = self._build_layouts(
            users, items, ratings, n_users, n_items, dcfg)
        reg, cg_iters = float(self._reg), int(self.cg_iters)
        rng = np.random.default_rng(self.seed)
        k = self.rank
        W = (np.asarray(W0, np.float32) if W0 is not None else
             (self.init_scale
              * rng.standard_normal((X.shape[1], k))).astype(np.float32))
        H = (np.asarray(H0, np.float32) if H0 is not None else
             (self.init_scale
              * rng.standard_normal((Y.shape[1], k))).astype(np.float32))

        sharded = bool(self.n_shards and self.n_shards > 1)
        # tol runs DEVICE-SIDE for the single-device program (while_loop,
        # mirroring ALS's scanned fit — zero per-sweep readbacks); the
        # sharded runner and verbose/checkpoint fits take the host loop
        stepwise = bool(self.verbose
                        or (self.checkpoint_dir and self.checkpoint_every)
                        or (sharded and self.tol > 0))
        if sharded:
            run_sweeps = self._make_sharded_runner(X, Y, user_layout,
                                                   item_layout)
        else:
            ub = device_buckets(user_layout)
            ib = device_buckets(item_layout)

            def run_sweeps(W, H, length, tol=0.0):
                fit_all = _imc_program(reg, cg_iters, length,
                                       n_users, n_items, tol)
                return fit_all(jnp.asarray(W), jnp.asarray(H), X, Y, ub, ib)

        if not stepwise:
            # Whole fit = ONE device program (lax.scan over sweeps, or a
            # tol while_loop); no per-sweep host round trips (matters
            # doubly over the remote-attached TPU tunnel).
            W, H, hist, n_done = run_sweeps(W, H, self._n_sweeps,
                                            tol=float(self.tol))
            hist = np.asarray(hist, np.float64)[: int(n_done)]
            self.history_ = list(hist)
        else:
            # Per-sweep host loop reusing ONE compiled length-1 program:
            # tol stopping (reference §3.1 'break if Δ < tol', applied to
            # the objective), async checkpoints, verbose prints.
            self.history_ = []
            prev = None
            for s in range(self._n_sweeps):
                W, H, hist, _ = run_sweeps(W, H, 1)
                cur = float(np.asarray(hist)[-1])
                self.history_.append(cur)
                if self.verbose:
                    print(f"[IMC] sweep {s + 1}: objective={cur:.6f}")
                self._maybe_checkpoint(s, W, H)
                if self.tol > 0 and prev is not None and abs(prev - cur) < self.tol:
                    break
                prev = cur
            self._finish_checkpoints()

        from recommendation_models_tpu.parallel.mesh import to_host
        self.W_ = to_host(W) if sharded else np.asarray(W)
        self.H_ = to_host(H) if sharded else np.asarray(H)
        self._X, self._Y = np.asarray(X), np.asarray(Y)
        # seen items per user for recommend(exclude_seen=True) — assigned
        # LAST, atomically with the factors: a refit that fails partway
        # must never leave new-data serving state paired with the old
        # fit's factors (r4 review)
        from recommendation_models_tpu.evaluate import grouped_by_user
        self._train_indptr, self._train_items = grouped_by_user(
            users, items, n_users)
        self._veff_cache = None     # projected catalog: rebuilt lazily
        self._veff_dev_cache = None  # sharded projected catalog (serving)
        self._fit_sharded_ = sharded  # route recommend() onto the mesh
        return self

    def _make_sharded_runner(self, X, Y, user_layout, item_layout):
        """Data-parallel fit: users (W step) and items (H step) row-sharded
        over the 'data' mesh axis; grams/CG per shard, psum on the (d, k)
        reductions (SURVEY.md [B:5]). Placement via
        make_array_from_callback: each process places only its addressable
        shards, so one process and a multi-host pod run the same code
        (mirrors parallel.sharded_als.ShardedALSProgram)."""
        from jax.sharding import NamedSharding, PartitionSpec as P
        from recommendation_models_tpu.data.layout import shard_layout
        from recommendation_models_tpu.parallel.mesh import get_mesh

        reg_ = float(self._reg)
        cg_ = int(self.cg_iters)
        mesh = get_mesh(self.n_shards, platform=self.platform,
                        num_slices=self.num_slices)
        axis = mesh.axis_names[0]
        S = self.n_shards
        ul = shard_layout(user_layout, S)
        il = shard_layout(item_layout, S)
        n_users, n_items = X.shape[0], Y.shape[0]

        # shared multi-process-safe placement (parallel.mesh — r4 review
        # deduped the verbatim copies here and in sharded_als)
        from recommendation_models_tpu.parallel.mesh import (
            replicate_put, shard_put as _sp)

        def shard_put(x):
            return _sp(mesh, axis, x)

        def repl_put(x):
            return replicate_put(mesh, x)

        def pad_rows(A, rows_per_shard):
            return np.pad(np.asarray(A, np.float32),
                          ((0, rows_per_shard * S - A.shape[0]), (0, 0)))

        Xp = shard_put(pad_rows(X, ul.rows_per_shard))
        Yp = shard_put(pad_rows(Y, il.rows_per_shard))

        def put(layout):
            return tuple(
                dict(row_ids=shard_put(layout.row_ids[i]),
                     indices=shard_put(layout.indices[i]),
                     values=shard_put(layout.values[i]),
                     mask=shard_put(layout.mask[i]))
                for i in range(len(layout.pads)))

        ub, ib = put(ul), put(il)
        bspec = jax.tree.map(
            lambda x: P(axis, *([None] * (x.ndim - 1))), ub)
        ispec = jax.tree.map(
            lambda x: P(axis, *([None] * (x.ndim - 1))), ib)

        @functools.lru_cache(maxsize=8)
        def make_prog(length):
            def body(W, H, X_loc, Y_loc, ub, ib):
                ubl = tuple(dict(row_ids=b["row_ids"][0],
                                 indices=b["indices"][0],
                                 values=b["values"][0], mask=b["mask"][0])
                            for b in ub)
                ibl = tuple(dict(row_ids=b["row_ids"][0],
                                 indices=b["indices"][0],
                                 values=b["values"][0], mask=b["mask"][0])
                            for b in ib)

                def sweep_body(carry, _):
                    W, H = carry
                    # Z/S towers must be GLOBAL tables (gram col ids are
                    # global) — project LOCAL feature rows then all_gather
                    # the (rows_local, k) results: the gathered bytes are
                    # rank-wide instead of feature-wide and the projection
                    # matmul shrinks S-fold (VERDICT r3 task 5b; per-row
                    # dots are row-independent, so this is bitwise the old
                    # full-table projection)
                    Z = jax.lax.all_gather(Y_loc @ H, axis, axis=0,
                                           tiled=True)[:n_items]
                    W, _ = _solve_factor(X_loc, Z, ubl, X_loc.shape[0],
                                         W, reg_, cg_, psum_axis=axis)
                    Sx = jax.lax.all_gather(X_loc @ W, axis, axis=0,
                                            tiled=True)[:n_users]
                    H, sse = _solve_factor(Y_loc, Sx, ibl, Y_loc.shape[0],
                                           H, reg_, cg_, psum_axis=axis)
                    obj = (0.5 * sse + 0.5 * reg_
                           * (jnp.sum(W ** 2) + jnp.sum(H ** 2)))
                    return (W, H), obj

                (W, H), hist = jax.lax.scan(sweep_body, (W, H), None,
                                            length=length)
                return W, H, hist

            from jax.sharding import PartitionSpec as P2
            sm = jax.shard_map(
                body, mesh=mesh,
                in_specs=(P2(), P2(), P2(axis, None), P2(axis, None),
                          bspec, ispec),
                out_specs=(P2(), P2(), P2()),
                check_vma=False,
            )
            return jax.jit(sm)

        # analytic per-shard collective traffic per sweep (VERDICT r3 task
        # 5a — parity with ALS's exchange_bytes_per_sweep_). Per half-step:
        # one tiled all_gather of the LOCAL (rows, k) projection, then the
        # dense (d, k) psums — b once, one per CG matvec (incl. the
        # per-restart true-residual matvecs), plus two scalars (r2, quad).
        # Ring all-reduce identity 2(S-1)/S * bytes for psums; all_gather
        # receives (S-1) shard blocks.
        k = self.rank
        mv = cg_matvec_count(cg_)
        ring = 2 * (S - 1) / S

        def half_bytes(rows_per_shard, d):
            gather = (S - 1) * rows_per_shard * k * 4
            psum = int(ring * 4 * (d * k * (mv + 1) + 2))
            return gather + psum

        self.exchange_bytes_per_sweep_ = out = {
            "w_step": half_bytes(il.rows_per_shard, X.shape[1]),
            "h_step": half_bytes(ul.rows_per_shard, Y.shape[1]),
        }
        out["per_sweep_total"] = out["w_step"] + out["h_step"]

        def run_sweeps(W, H, length, tol=0.0):
            # sharded tol fits route through the host stepwise loop
            # (fit() guarantees tol == 0 here)
            assert tol == 0.0
            W, H, hist = make_prog(length)(repl_put(W), repl_put(H),
                                           Xp, Yp, ub, ib)
            return W, H, hist, length

        return run_sweeps

    # ------------------------------------------------------------------
    def _finish_checkpoints(self):
        if self.checkpoint_dir and self.checkpoint_every:
            from recommendation_models_tpu.utils.checkpoint import wait_pending
            wait_pending()

    def _maybe_checkpoint(self, sweep_idx, W, H):
        if not self.checkpoint_dir or not self.checkpoint_every:
            return
        if (sweep_idx + 1) % self.checkpoint_every:
            return
        from recommendation_models_tpu.parallel.mesh import to_host
        from recommendation_models_tpu.utils.checkpoint import save_checkpoint
        # host staging first: W/H may be replicated mesh arrays on a
        # multi-process run (to_host is a cross-process collective, as is
        # the orbax save — every process calls both)
        save_checkpoint(
            self.checkpoint_dir, step=sweep_idx + 1,
            state=dict(W=to_host(W), H=to_host(H),
                       history=np.asarray(self.history_, np.float32)),
            metadata={k: v for k, v in self.get_params().items()
                      if isinstance(v, (int, float, str, bool, type(None)))},
            wait=False,
        )

    def resume(self, checkpoint_dir: Optional[str] = None):
        """Load factors (and sweep history) from the latest checkpoint.
        Returns the sweep number to continue from (pass ``W0=model.W_,
        H0=model.H_`` to the next ``fit`` call)."""
        from recommendation_models_tpu.utils.checkpoint import load_latest
        step, state = load_latest(checkpoint_dir or self.checkpoint_dir)
        self.W_ = np.asarray(state["W"])
        self.H_ = np.asarray(state["H"])
        self.history_ = list(np.asarray(state["history"]))
        self._veff_cache = None
        self._veff_dev_cache = None
        return step

    # ------------------------------------------------------------------
    def __getstate__(self):
        """Picklable fitted estimator (mirrors ALS.__getstate__): the
        projected-catalog caches hold device arrays and mesh handles —
        dropped here, rebuilt lazily on the next recommend()."""
        state = dict(self.__dict__)
        state.pop("_veff_cache", None)
        state.pop("_veff_dev_cache", None)
        return state

    def _check_fitted(self):
        if not hasattr(self, "W_"):
            raise RuntimeError("this IMC instance is not fitted yet")

    def _features(self, X, Y):
        """Resolve (X, Y) against the training features with a GUIDED error
        when absent (a resumed-from-checkpoint estimator has factors but no
        features — a bare AttributeError told the user nothing; r4
        review)."""
        if (X is None and not hasattr(self, "_X")) or (
                Y is None and not hasattr(self, "_Y")):
            raise RuntimeError(
                "feature matrices unavailable: this estimator was resumed "
                "from a checkpoint without training features — pass X and "
                "Y explicitly (or call fit())")
        X = self._X if X is None else np.asarray(X, np.float32)
        Y = self._Y if Y is None else np.asarray(Y, np.float32)
        return X, Y

    def predict(self, users, items, X=None, Y=None) -> np.ndarray:
        """Predict ratings; pass fresh X/Y rows for inductive cold-start
        entities (users/items then index into the given matrices)."""
        self._check_fitted()
        X, Y = self._features(X, Y)
        users = np.asarray(users, np.int64)
        items = np.asarray(items, np.int64)
        return np.einsum("ok,ok->o", X[users] @ self.W_, Y[items] @ self.H_)

    def predict_all(self, user: int, X=None, Y=None) -> np.ndarray:
        """Scores for every item for one user (reference ``predict_all``,
        SURVEY.md §2.1 row 8); pass a fresh 1-row ``X`` for a cold-start
        user."""
        self._check_fitted()
        X, Y = self._features(X, Y)
        if Y is getattr(self, "_Y", None):
            # serving loops call this per user: reuse recommend()'s cached
            # catalog projection instead of redoing the (n_items, d) @
            # (d, k) matmul every call (r4 review). The cache is in
            # permuted serving order — map back to catalog id order.
            Veff_p, _, perm_fwd = self._veff_cached()
            return np.asarray(Veff_p)[perm_fwd] @ (X[user] @ self.W_)
        return (X[user] @ self.W_) @ (Y @ self.H_).T

    def rmse(self, R, X=None, Y=None) -> float:
        users, items, ratings = _as_triplets(R)
        pred = self.predict(users, items, X, Y)
        return float(np.sqrt(np.mean((ratings - pred) ** 2)))

    def score(self, R, X=None, Y=None) -> float:
        """Negative RMSE over observed entries (higher is better)."""
        return -self.rmse(R, X, Y)

    def _veff_cached(self):
        """The projected training catalog ``_Y @ H_`` in PERMUTED row
        order (ops.topk.serving_permutation — catalog-id order correlates
        with popularity, which breaks approx_max_k's recall guarantee; r5
        serving-quality ledger), cached across serving calls (VERDICT r2
        weak item 2). Keyed on H_'s CONTENT (tiny — hashing is
        microseconds) + _Y's identity (large; the cache HOLDS it so its id
        can't be recycled): any swap OR in-place mutation of H_, and any
        swap of _Y, invalidates with no explicit reset (ADVICE r3 + r4
        review). In-place edits of the big _Y remain the caller's
        responsibility — hashing the full catalog every call would dwarf
        the projection it caches. Returns (Veff_permuted, perm_back,
        perm_fwd)."""
        from recommendation_models_tpu.ops.topk import serving_permutation
        h_key = hash(np.asarray(self.H_).tobytes())
        cache = getattr(self, "_veff_cache", None)
        if cache is None or cache[0] != h_key or cache[1] is not self._Y:
            perm_back, perm_fwd = serving_permutation(self._Y.shape[0])
            self._veff_cache = (h_key, self._Y,
                                (jnp.asarray((self._Y @ self.H_)[perm_back]),
                                 perm_back, perm_fwd))
        return self._veff_cache[2]

    def _veff_dev_cached(self):
        """Device-resident ROW-SHARDED projected catalog ``_Y @ H_`` for
        serving after a sharded fit (SURVEY.md §2.2 N9 serves BOTH
        estimators; VERDICT r4 weak #3 — the single-device path
        materialized the full catalog on the default device). Same
        invalidation keying as ``_veff_cached``; rows are in permuted
        serving order (ops.topk.serving_permutation). Returns
        ``(Veff_sharded, mesh, axis, perm_back, perm_fwd)`` or ``None``
        when the serving mesh cannot be built here (e.g. unpickled on a
        smaller host)."""
        from recommendation_models_tpu.ops.topk import serving_permutation
        from recommendation_models_tpu.parallel.mesh import (
            get_mesh, shard_put)
        h_key = hash(np.asarray(self.H_).tobytes())
        cache = getattr(self, "_veff_dev_cache", None)
        if cache is not None and cache[0] == h_key and cache[1] is self._Y:
            return cache[2]
        try:
            mesh = get_mesh(self.n_shards, platform=self.platform,
                            num_slices=self.num_slices)
        except Exception:
            return None
        axis = mesh.axis_names[0]
        S = mesh.shape[axis]
        perm_back, perm_fwd = serving_permutation(self._Y.shape[0])
        Veff = np.asarray((self._Y @ self.H_)[perm_back], np.float32)
        per = -(-Veff.shape[0] // S)
        Veff = np.pad(Veff, ((0, per * S - Veff.shape[0]), (0, 0)))
        out = (shard_put(mesh, axis, Veff), mesh, axis, perm_back, perm_fwd)
        self._veff_dev_cache = (h_key, self._Y, out)
        return out

    def recommend(self, user_ids, n: int = 10, X=None, Y=None,
                  exclude_seen: bool = False, method: str = "auto",
                  recall_target: float = 0.99):
        """Top-n items by bilinear score (cold-start capable via X/Y).

        Scoring runs through the TPU top-k retrieval path (ops.topk) on the
        PROJECTED factors U_eff = X W, V_eff = Y H — the bilinear model is
        a rank-k dot product after projection, so IMC serving shares ALS's
        fused approx_max_k machinery (SURVEY.md N9) instead of the
        reference's full argsort. ``exclude_seen`` drops the training
        items of in-training users (overfetch-and-filter, never a scatter
        into materialized scores); cold-start rows (fresh X) have nothing
        to exclude.
        """
        self._check_fitted()
        from recommendation_models_tpu.ops.topk import (
            grouped_exclusion_topk, topk_scores)
        if (X is None and not hasattr(self, "_X")) or (
                Y is None and not hasattr(self, "_Y")):
            raise RuntimeError(
                "recommend() needs feature matrices: this estimator was "
                "resumed from a checkpoint without training features — "
                "pass X and Y explicitly (or call fit())")
        X = self._X if X is None else np.asarray(X, np.float32)
        fresh_Y = Y is not None
        Y = self._Y if Y is None else np.asarray(Y, np.float32)
        user_ids = np.atleast_1d(np.asarray(user_ids, np.int64))

        def query_rows(ids):
            return jnp.asarray(X[ids] @ self.W_)

        sharded = None
        if not fresh_Y and getattr(self, "_fit_sharded_", False):
            # after a sharded fit, serving stays ON THE MESH like ALS
            # (models/als.py _topk_backend): the projected catalog is
            # row-sharded, the heavy scoring matmul rides the shards, and
            # cross-shard traffic is O(B * k * n_shards)
            sharded = self._veff_dev_cached()
        from recommendation_models_tpu.ops.topk import (
            permuted_topk, serving_permutation)
        if sharded is not None:
            from recommendation_models_tpu.ops.topk import sharded_topk
            Veff_sh, mesh, axis, perm_back, perm_fwd = sharded
            n_cat = self._Y.shape[0]
            n = min(n, n_cat)

            def topk_raw(Uq, kk, excl):
                return sharded_topk(Uq, Veff_sh, kk, mesh, axis=axis,
                                    exclude=excl, method=method,
                                    recall_target=recall_target,
                                    n_valid=n_cat)
            topk = permuted_topk(topk_raw, perm_back, perm_fwd)
        else:
            if fresh_Y:
                # fresh catalogs get the same decorrelating permutation
                # (their id order is just as popularity-correlated)
                perm_back, perm_fwd = serving_permutation(Y.shape[0])
                Veff = jnp.asarray((Y @ self.H_)[perm_back])
            else:
                Veff, perm_back, perm_fwd = self._veff_cached()
            n = min(n, Veff.shape[0])

            def topk_raw(Uq, kk, excl):
                return topk_scores(Uq, Veff, kk, excl, method=method,
                                   recall_target=recall_target)
            topk = permuted_topk(topk_raw, perm_back, perm_fwd)

        if exclude_seen and not hasattr(self, "_train_indptr"):
            # mirror ALS.recommend: a resumed-from-checkpoint estimator has
            # factors but no training observation lists — serving silently
            # WITH seen items would break the reference top_n contract
            import warnings
            warnings.warn(
                "recommend(exclude_seen=True) on an estimator without "
                "training indices (e.g. resumed from a checkpoint): seen "
                "items canNOT be excluded; serving unfiltered scores. "
                "Call fit() to restore exclusion.", stacklevel=2)
        if exclude_seen and fresh_Y:
            # training item ids address the TRAINING catalog's rows:
            # excluding them from a FRESH Y's score rows would silently
            # drop arbitrary new-catalog items (r4 review)
            import warnings
            warnings.warn(
                "recommend(exclude_seen=True) with a fresh Y catalog: "
                "seen-item exclusion applies to the training catalog "
                "only; serving unfiltered scores over the new catalog.",
                stacklevel=2)
        # fresh-X queries index a DIFFERENT user space, fresh-Y a
        # different catalog: only exclude when both address training data
        if (exclude_seen and hasattr(self, "_train_indptr") and not fresh_Y
                and X is getattr(self, "_X", None) and user_ids.size):
            # degree-bucketed exclusion, shared with ALS (one whale user
            # must not drag every row's overfetch to catalog width)
            return grouped_exclusion_topk(user_ids, n, self._train_indptr,
                                          self._train_items, query_rows,
                                          topk)
        sc, it = topk(query_rows(user_ids), n, None)
        return np.asarray(sc), np.asarray(it)

    def top_n(self, user: int, n: int = 10, exclude_seen: bool = False):
        """Single-user convenience: ranked item ids."""
        _, items = self.recommend([user], n, exclude_seen=exclude_seen)
        return items[0]


__all__ = ["IMC"]
