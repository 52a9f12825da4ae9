"""ALS estimator — the reference's `class ALS` (SURVEY.md §2.1 row 2),
sklearn-style surface over the TPU-native engine.

API parity (fit / predict / score / get_params / set_params / top-N) with
NumPy/scipy-sparse in, NumPy out; the mesh, padded layout, sharding, and
jitted sweeps are hidden beneath (SURVEY.md N11). Objectives:

  alpha=None  explicit least squares on ratings (reference default)
  alpha=a     Hu-Koren-Volinsky confidence-weighted implicit objective

`score` returns **negative RMSE** over the provided entries (higher-is-better
per the sklearn contract; exact reference semantics are re-verification item
SURVEY.md §0.5 — `rmse()` is also exposed directly).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from recommendation_models_tpu.config import DataConfig, SolveConfig
from recommendation_models_tpu.data.layout import (
    build_layout, csr_arrays, layout_from_coo, shard_layout,
)
from recommendation_models_tpu.models.base import BaseEstimator
from recommendation_models_tpu.ops.topk import topk_scores
from recommendation_models_tpu.solver.als_sweep import device_buckets, make_sweep_fns


class ALS(BaseEstimator):
    """TPU-native alternating least squares matrix factorization.

    Parameters mirror the reference estimator (rank, reg/lambda_, max_iter->
    n_sweeps, tol, random seed) plus TPU-engine knobs (solver, chunk,
    n_shards, exchange, compute_dtype).
    """

    def __init__(
        self,
        rank: int = 10,
        reg: Optional[float] = None,        # None => 0.1 (alias sentinel)
        alpha: Optional[float] = None,
        n_sweeps: Optional[int] = None,     # None => 10 (alias sentinel)
        tol: float = 0.0,
        reg_by_degree: bool = False,
        solver: str = "auto",
        chunk: int = 512,
        gather_budget_mb: int = 0,
        compute_dtype: str = "auto",
        sse_mode: str = "auto",
        n_shards: Optional[int] = None,
        num_slices: Optional[int] = None,
        topology: str = "1d",
        exchange: str = "allgather",
        exchange_head: Optional[int] = None,
        platform: Optional[str] = None,
        seed: int = 0,
        init_scale: float = 0.01,
        min_bucket: int = 8,
        max_bucket: int = 4096,
        bucket_growth: Optional[float] = None,
        hot_cols: Optional[int] = None,
        dense_min_degree: Optional[int] = None,
        checkpoint_dir: Optional[str] = None,
        checkpoint_every: int = 0,
        layout_cache: Optional[str] = None,
        verbose: int = 0,
        lambda_: Optional[float] = None,
        max_iter: Optional[int] = None,
        data_config: Optional[DataConfig] = None,
    ):
        self.rank = rank
        self.reg = reg
        self.alpha = alpha
        self.n_sweeps = n_sweeps
        self.tol = tol
        self.reg_by_degree = reg_by_degree
        self.solver = solver
        self.chunk = chunk
        self.gather_budget_mb = gather_budget_mb
        self.compute_dtype = compute_dtype
        self.sse_mode = sse_mode
        self.n_shards = n_shards
        self.num_slices = num_slices
        self.topology = topology
        self.exchange = exchange
        self.exchange_head = exchange_head
        self.platform = platform
        self.seed = seed
        self.init_scale = init_scale
        self.min_bucket = min_bucket
        self.max_bucket = max_bucket
        self.bucket_growth = bucket_growth
        self.hot_cols = hot_cols
        self.dense_min_degree = dense_min_degree
        self.checkpoint_dir = checkpoint_dir
        self.checkpoint_every = checkpoint_every
        self.layout_cache = layout_cache
        self.verbose = verbose
        # full-fidelity structured layout config (overrides the individual
        # layout kwargs; every DataConfig knob honored verbatim — the
        # per-field from_configs mapping silently dropped dense_whales /
        # dense_budget_mb / hot_min_count / bucket_merge_slack and
        # conflated dense_min_degree sentinels, r4 review)
        self.data_config = data_config
        # reference-name aliases (SURVEY.md §0 items 1-2: the reference's
        # exact kwarg names are unverifiable while the mount is empty;
        # accepting both makes the estimator a drop-in either way). When
        # set, they take precedence over reg / n_sweeps.
        self.lambda_ = lambda_
        self.max_iter = max_iter

    # loud alias conflict detection via None sentinels: an explicitly
    # passed value (even the documented default) is distinguishable, so a
    # grid search sweeping `reg` while the alias is set can never be a
    # silent no-op (models.base.resolve_alias)
    @property
    def _reg(self) -> float:
        from recommendation_models_tpu.models.base import resolve_alias
        return resolve_alias(self.reg, self.lambda_, 0.1, "reg", "lambda_")

    @property
    def _n_sweeps(self) -> int:
        from recommendation_models_tpu.models.base import resolve_alias
        return resolve_alias(self.n_sweeps, self.max_iter, 10,
                             "n_sweeps", "max_iter")

    # Fitted factor state. Sharded fits keep the tables DEVICE-RESIDENT on
    # the mesh (SURVEY.md §3.5/N9: serving routes through sharded_topk with
    # zero full-table host fetches); `U_`/`V_` materialize to host lazily on
    # first access. NOTE for multi-process meshes: `to_host` is a collective
    # — every process must touch `U_`/`V_` symmetrically.
    _U_host = _V_host = None
    _U_dev = _V_dev = None

    @property
    def U_(self) -> np.ndarray:
        if self._U_host is None and self._U_dev is not None:
            from recommendation_models_tpu.parallel.mesh import to_host
            self._U_host = to_host(self._U_dev)[: self.n_users_]
        return self._U_host

    @U_.setter
    def U_(self, value):
        self._U_host = value
        self._U_dev = None

    @property
    def V_(self) -> np.ndarray:
        if self._V_host is None and self._V_dev is not None:
            from recommendation_models_tpu.parallel.mesh import to_host
            self._V_host = to_host(self._V_dev)[: self.n_items_]
        return self._V_host

    @V_.setter
    def V_(self, value):
        self._V_host = value
        self._V_dev = None
        self._vdev_cache = None     # serving-side device copy is stale

    # ------------------------------------------------------------------
    @classmethod
    def from_configs(cls, solve=None, mesh=None, data=None, fit=None):
        """Build an estimator from the frozen config dataclasses
        (SURVEY.md §5 'Config / flag system': the sklearn kwargs surface is
        the user API; these are the structured layer beneath, used by batch
        entry points)."""
        from recommendation_models_tpu.config import (
            DataConfig, FitConfig, MeshConfig,
        )
        solve = solve or SolveConfig()
        mesh = mesh or MeshConfig()
        data = data or DataConfig()
        fit = fit or FitConfig()
        return cls(
            rank=solve.rank, reg=solve.reg, alpha=solve.alpha,
            reg_by_degree=solve.reg_by_degree, solver=solve.solver,
            chunk=solve.chunk, gather_budget_mb=solve.gather_budget_mb,
            compute_dtype=solve.compute_dtype, sse_mode=solve.sse_mode,
            n_shards=mesh.n_shards, num_slices=mesh.num_slices,
            topology=mesh.topology,
            exchange=mesh.exchange, exchange_head=mesh.exchange_head,
            platform=mesh.platform,
            data_config=data, layout_cache=data.layout_cache,
            n_sweeps=fit.n_sweeps, tol=fit.tol, seed=fit.seed,
            init_scale=fit.init_scale,
            checkpoint_dir=fit.checkpoint_dir,
            checkpoint_every=fit.checkpoint_every,
        )

    def _solve_config(self) -> SolveConfig:
        return SolveConfig(
            rank=self.rank, reg=self._reg, reg_by_degree=self.reg_by_degree,
            alpha=self.alpha, chunk=self.chunk, solver=self.solver,
            gather_budget_mb=self.gather_budget_mb,
            compute_dtype=self.compute_dtype, sse_mode=self.sse_mode,
        )

    def _data_config(self) -> DataConfig:
        if self.data_config is not None:
            # structured config taken VERBATIM except the two unresolved
            # autos the dataclass documents (bucket_growth=None and
            # dense_min_degree=None); every explicit value — including
            # 512 at rank 128 — is honored literally (r4 review: the old
            # per-field mapping conflated sentinels and dropped knobs)
            import dataclasses
            from recommendation_models_tpu.config import (
                bucket_growth_for_rank, dense_min_degree_for_rank)
            dcfg = self.data_config
            if dcfg.bucket_growth is None:
                dcfg = dataclasses.replace(
                    dcfg, bucket_growth=bucket_growth_for_rank(self.rank))
            if dcfg.dense_min_degree is None:
                dcfg = dataclasses.replace(
                    dcfg, dense_min_degree=dense_min_degree_for_rank(
                        self.rank, dcfg.max_bucket))
            return dcfg
        hot = self.hot_cols
        if hot is None:
            # auto: as many hot columns as the fused solve kernel's VMEM
            # budget allows at this rank (ML-25M rank-64: 0.374 -> 0.346
            # s/epoch), or 0 when the cap shrinks below break-even width
            # (hot_cols_auto; C=32 at k=128 measurably loses). The count
            # threshold (DataConfig.hot_min_count auto) keeps it
            # break-even-safe on unskewed data. Sharded fits KEEP hot
            # columns under 'allgather' and 'hybrid'; only 'all_to_all'
            # disables them (_fit_sharded).
            from recommendation_models_tpu.ops.pallas.cholesky import (
                hot_cols_auto)
            hot = hot_cols_auto(self.rank)
        dmd = self.dense_min_degree
        if dmd is None:
            # auto: the dense-whale break-even degree scales ~rank^2
            # (config.dense_min_degree_for_rank; measured 512@k=64,
            # 2048@k=128 on v5e).
            from recommendation_models_tpu.config import (
                dense_min_degree_for_rank)
            dmd = dense_min_degree_for_rank(self.rank, self.max_bucket)
        growth = self.bucket_growth
        if growth is None:
            # auto: finer grids cut padding (1.12 wins at k<=64) but extra
            # bucket shapes cost at solve-bound k=128 (1.25) — measured,
            # config.bucket_growth_for_rank
            from recommendation_models_tpu.config import (
                bucket_growth_for_rank)
            growth = bucket_growth_for_rank(self.rank)
        return DataConfig(min_bucket=self.min_bucket,
                          max_bucket=self.max_bucket, hot_cols=hot,
                          bucket_growth=growth,
                          dense_min_degree=dmd)

    def _build_layouts(self, indptr, indices, data, n_users, n_items, dcfg):
        """Both orientations' padded layouts, optionally through the packed
        on-disk cache (SURVEY.md §7 hard part 6: bucket once, not per run)."""
        from recommendation_models_tpu.data.layout_cache import cached_layout

        def build_user():
            return build_layout(indptr, indices, data, n_users, n_items, dcfg)

        def build_item():
            rows = np.repeat(np.arange(n_users), np.diff(indptr))
            return layout_from_coo(rows, indices, data, n_users, n_items,
                                   dcfg, transpose=True)

        prefix = self.layout_cache
        # distinct cache files per LAYOUT CONFIG (config_tag hashes the
        # FULL DataConfig field set — a hand-listed tag silently missed
        # knobs like max_bucket/bucket_merge_slack, r4 review) AND per
        # data content (the fingerprint invalidates the cache when the
        # same prefix is refit on different data — round-1 gap).
        from recommendation_models_tpu.data.layout_cache import (
            config_tag, data_fingerprint)
        tag = f".cfg{config_tag(dcfg)}"
        if prefix:
            tag += "." + data_fingerprint(indptr, indices, data)
        user_layout = cached_layout(
            f"{prefix}{tag}.user.npz" if prefix else None, build_user)
        item_layout = cached_layout(
            f"{prefix}{tag}.item.npz" if prefix else None, build_item)
        return user_layout, item_layout

    def _init_factors_host(self, n_users, n_items):
        key_u, key_v = jax.random.split(jax.random.PRNGKey(self.seed))
        U = self.init_scale * jax.random.normal(key_u, (n_users, self.rank))
        V = self.init_scale * jax.random.normal(key_v, (n_items, self.rank))
        return U.astype(jnp.float32), V.astype(jnp.float32)

    # ------------------------------------------------------------------
    def fit(self, R, U0=None, V0=None):
        """Fit factors to the ratings matrix R (scipy sparse or dense).

        Optional U0/V0 warm starts (also used by parity tests to pin init).
        """
        if self.rank < 1:
            raise ValueError(f"rank must be >= 1, got {self.rank}")
        if self._reg < 0:
            raise ValueError(f"reg must be >= 0, got {self._reg}")
        if self._n_sweeps < 1:
            raise ValueError(f"n_sweeps must be >= 1, got {self._n_sweeps}")
        indptr, indices, data, n_users, n_items = csr_arrays(R)
        self.n_users_, self.n_items_ = n_users, n_items
        self._train_indptr, self._train_indices = indptr, indices
        dcfg, scfg = self._data_config(), self._solve_config()
        nnz = indices.shape[0]
        # the auto (0) gather budget resolves inside the solver against the
        # actual padded bucket volume (solver.als_sweep.resolve_gather_budget
        # — rank- AND size-gated; the unsplit k>64 mode OOMs at 100M scale)

        if (U0 is None) != (V0 is None):
            raise ValueError(
                "warm starts need BOTH U0 and V0 (passing one alone was "
                "silently ignored and both factors re-initialized)")
        n_shards = self.n_shards
        if n_shards is not None and n_shards > 1:
            return self._fit_sharded(indptr, indices, data, U0, V0, dcfg, scfg)
        if self.topology != "1d":
            raise ValueError(
                f"topology={self.topology!r} needs a sharded fit: set "
                f"n_shards > 1 (got {n_shards})")
        # a prior SHARDED fit's program pins nnz-scale device bucket
        # pytrees in HBM and stale traffic accounting — clear on the
        # single-device path (the sharded/hybrid paths reset these
        # themselves; r4 review)
        self._sharded_program = None
        self._take_jit = None
        self.__dict__.pop("exchange_bytes_per_sweep_", None)

        from recommendation_models_tpu.ops.pallas.cholesky import block_batch
        user_layout, item_layout = self._build_layouts(
            indptr, indices, data, n_users, n_items, dcfg)
        ub = device_buckets(user_layout, block_batch(self.rank))
        ib = device_buckets(item_layout, block_batch(self.rank))

        if U0 is not None and V0 is not None:
            U = jnp.asarray(U0, jnp.float32)
            V = jnp.asarray(V0, jnp.float32)
        else:
            U, V = self._init_factors_host(n_users, n_items)

        stepwise = ((self.checkpoint_dir and self.checkpoint_every)
                    or self.verbose)
        if not stepwise:
            # Whole fit is ONE device program (lax.scan over sweeps) — no
            # per-sweep host round trips (§3.1 loop, device-resident). A
            # tol stopping rule runs as a device-side while_loop (sweeps
            # never run come back as the -1 sentinel and are trimmed here).
            from recommendation_models_tpu.solver.als_sweep import make_scanned_fit
            fit_fn = make_scanned_fit(ub, ib, n_users, n_items, scfg,
                                      self._n_sweeps, tol=self.tol,
                                      nnz=max(nnz, 1))
            U, V, sse, n_done = fit_fn(U, V)
            # trim by the DEVICE-REPORTED sweep count (scale-safe), then
            # clamp: near-interpolation fits can return tiny negative SSE
            # from f32 cancellation in the r2 - x.rhs - reg||x||^2 identity
            # (fuzz-found: a value-vs-sentinel compare misclassified them)
            sse_h = np.maximum(np.asarray(sse)[: int(n_done)], 0.0)
            self.history_ = list(np.sqrt(sse_h / max(nnz, 1)))
        else:
            sweep, train_sse = make_sweep_fns(ub, ib, n_users, n_items, scfg)
            self.history_ = []
            prev = None
            for s in range(self._n_sweeps):
                U, V = sweep(U, V)
                cur = float(jnp.sqrt(train_sse(U, V) / max(nnz, 1)))
                self.history_.append(cur)
                if self.verbose:
                    print(f"[ALS] sweep {s + 1}: train_rmse={cur:.6f}")
                self._maybe_checkpoint(s, U, V)
                if self.tol > 0 and prev is not None and abs(prev - cur) < self.tol:
                    break
                prev = cur

        self._finish_checkpoints()
        self.U_ = np.asarray(U)
        self.V_ = np.asarray(V)
        return self

    def _fit_sharded(self, indptr, indices, data, U0, V0, dcfg, scfg):
        from recommendation_models_tpu.parallel.mesh import get_mesh
        from recommendation_models_tpu.parallel.sharded_als import ShardedALSProgram

        n_users, n_items = self.n_users_, self.n_items_
        nnz = indices.shape[0]
        if self.topology not in ("1d", "obs_parallel"):
            raise ValueError(
                f"topology must be '1d' or 'obs_parallel', got "
                f"{self.topology!r}")
        if self.topology == "obs_parallel":
            return self._fit_hybrid_2d(indptr, indices, data, U0, V0,
                                       dcfg, scfg)
        mesh = get_mesh(self.n_shards, platform=self.platform,
                        num_slices=self.num_slices)
        import dataclasses
        from recommendation_models_tpu.ops.pallas.cholesky import block_batch
        head = 0
        if self.exchange == "all_to_all":
            # the rotation exchange serves a COMPACT remapped table, so
            # global-column-id blocks can't run there: whales stay on the
            # wide-bucket path. 'allgather' shards see the full opposite
            # table and keep the dense-whale + hot-column fast paths.
            dcfg = dataclasses.replace(dcfg, dense_whales=False, hot_cols=0)
        elif self.exchange == "hybrid":
            # hybrid replicates the Zipf-head rows, which also carries the
            # hot-column fast path (hot_ids remap into the head block);
            # the dense-whale block still needs the FULL opposite table
            # (its value rows span all global columns), so it stays off.
            dcfg = dataclasses.replace(dcfg, dense_whales=False)
            head = (self.exchange_head if self.exchange_head is not None
                    else max(1024, 8 * dcfg.hot_cols))
        ul, il = self._build_layouts(indptr, indices, data, n_users, n_items,
                                     dcfg)
        user_layout = shard_layout(ul, self.n_shards,
                                   row_multiple=block_batch(self.rank))
        item_layout = shard_layout(il, self.n_shards,
                                   row_multiple=block_batch(self.rank))
        prog = ShardedALSProgram(user_layout, item_layout, mesh, scfg,
                                 exchange=self.exchange, head=head)
        self._sharded_program = prog
        self._take_jit = None          # mesh may have changed: re-jit lazily
        # per-sweep ICI traffic of the chosen exchange (utils.logging
        # 'collective bytes'; the train CLI logs it per sweep)
        self.exchange_bytes_per_sweep_ = prog.collective_bytes_per_sweep()
        if self.verbose:
            mb = self.exchange_bytes_per_sweep_["per_sweep_total"] / 2**20
            print(f"[ALS] exchange={self.exchange} collective traffic "
                  f"{mb:.2f} MiB/shard/sweep")

        if U0 is not None and V0 is not None:
            U, V = prog.place_factors(U0, V0)
        else:
            U, V = prog.init_factors(self.seed, self.init_scale)

        U, V = self._run_program_fit(prog, U, V, nnz)
        # keep the padded tables on the mesh: recommend() serves through
        # sharded_topk without ever fetching a full table to host; U_/V_
        # materialize lazily for the estimator surface
        self._U_dev, self._V_dev = U, V
        self._U_host = self._V_host = None
        return self

    def _run_program_fit(self, prog, U, V, nnz):
        """Drive a sharded/hybrid program's fit and fill ``history_``.

        No callbacks needed => ONE jitted device program for the whole fit
        (``prog.make_fit``: scan over sweeps, device-side tol, per-sweep
        SSE riding the item half's solves — zero per-sweep host readbacks
        and zero surplus exchanges, the repo's one-device-program
        invariant, VERDICT r3 weak #3). Otherwise a per-sweep host loop
        via ``sweep_with_sse`` (the SSE still shares the sweep's own
        exchanges; ``train_sse`` would re-run the user-half exchange)."""
        nnz = max(nnz, 1)
        stepwise = ((self.checkpoint_dir and self.checkpoint_every)
                    or self.verbose)
        if not stepwise:
            fit_fn = prog.make_fit(self._n_sweeps, tol=self.tol, nnz=nnz)
            U, V, sse, n_done = fit_fn(U, V)
            sse_h = np.maximum(np.asarray(sse)[: int(n_done)], 0.0)
            self.history_ = list(np.sqrt(sse_h / nnz))
        else:
            self.history_ = []
            prev = None
            for s in range(self._n_sweeps):
                U, V, sse = prog.sweep_with_sse(U, V)
                cur = float(jnp.sqrt(jnp.maximum(sse, 0.0) / nnz))
                self.history_.append(cur)
                if self.verbose:
                    print(f"[ALS] sweep {s + 1}: train_rmse={cur:.6f}")
                self._maybe_checkpoint(s, U, V)
                if (self.tol > 0 and prev is not None
                        and abs(prev - cur) < self.tol):
                    break
                prev = cur
        self._finish_checkpoints()
        return U, V

    def _fit_hybrid_2d(self, indptr, indices, data, U0, V0, dcfg, scfg):
        """Observation-parallel 2-D (dcn x data) fit (SURVEY.md N6;
        VERDICT r3 task 6: the library-level ``HybridALSProgram`` gets a
        user surface). For the few-rows x huge-degree regime where
        replicating per-row normal equations over DCN undercuts
        replicating the opposite table (parallel.hybrid_als module
        docstring; ``parallel.scaling.choose_topology`` quantifies).

        ``n_shards`` = TOTAL devices, split as (dcn=num_slices,
        data=n_shards // num_slices)."""
        import dataclasses
        from recommendation_models_tpu.parallel.hybrid_als import (
            HybridALSProgram)
        from recommendation_models_tpu.parallel.mesh import (
            get_hybrid_mesh, to_host)

        if self.exchange != "allgather":
            raise ValueError(
                "topology='obs_parallel' has its own comm pattern (intra-"
                "slice gathers + DCN gram psum); exchange modes apply to "
                "the 1-D topology only")
        n_users, n_items = self.n_users_, self.n_items_
        nnz = indices.shape[0]
        if not self.num_slices or self.num_slices < 2:
            # a 1-slice "obs-parallel" mesh has zero observation
            # parallelism (dcn axis of size 1) — the defining feature the
            # user asked for; degenerate silently-1-d runs are the exact
            # silent-ignore class this surface validates against
            raise ValueError(
                "topology='obs_parallel' needs num_slices >= 2 (the dcn "
                f"axis carries the observation split), got "
                f"{self.num_slices!r}")
        D = self.num_slices
        if self.n_shards % D:
            raise ValueError(
                f"n_shards={self.n_shards} must be divisible by "
                f"num_slices={D} for the 2-D (dcn x data) mesh")
        S = self.n_shards // D
        mesh = get_hybrid_mesh(self.n_shards, num_slices=D,
                               platform=self.platform)
        # dense-whale / hot-column blocks need the full opposite table per
        # device — unsupported here by construction (hybrid_als docstring)
        dcfg = dataclasses.replace(dcfg, dense_whales=False, hot_cols=0)
        ul, il = self._build_layouts(indptr, indices, data, n_users,
                                     n_items, dcfg)
        prog = HybridALSProgram(shard_layout(ul, S), shard_layout(il, S),
                                mesh, scfg)
        self._sharded_program = None     # serving goes through host tables
        self.exchange_bytes_per_sweep_ = prog.collective_bytes_per_sweep()
        if self.verbose:
            b = self.exchange_bytes_per_sweep_
            print(f"[ALS] obs-parallel 2-D mesh (dcn={D} x data={S}): "
                  f"{b['ici'] / 2**20:.2f} MiB ICI + "
                  f"{b['dcn'] / 2**20:.2f} MiB DCN /device/sweep")

        if U0 is not None and V0 is not None:
            U, V = prog.place_factors(U0, V0)
        else:
            U, V = prog.init_factors(self.seed, self.init_scale)

        U, V = self._run_program_fit(prog, U, V, nnz)
        # factors replicated across 'dcn', sharded over 'data': materialize
        # to host (serving reuses the single-device top-k path; the 2-D
        # mesh exists for training's comm pattern, not retrieval's)
        self.U_ = to_host(U)[:n_users]
        self.V_ = to_host(V)[:n_items]
        return self

    def _finish_checkpoints(self):
        if self.checkpoint_dir and self.checkpoint_every:
            from recommendation_models_tpu.utils.checkpoint import wait_pending
            wait_pending()

    def _maybe_checkpoint(self, sweep_idx, U, V):
        if not self.checkpoint_dir or not self.checkpoint_every:
            return
        if (sweep_idx + 1) % self.checkpoint_every:
            return
        from recommendation_models_tpu.utils.checkpoint import save_checkpoint
        # async: the sweep loop never blocks on disk (arrays stage to host
        # before save() returns, so the next sweep's donation is safe);
        # fit() waits for the last commit before returning
        meta = {k: v for k, v in self.get_params().items()
                if isinstance(v, (int, float, str, bool, type(None)))}
        # true table sizes: sharded fits checkpoint PADDED tables, and a
        # resumed estimator needs n_users_/n_items_ for recommend()/top_n
        meta["n_users"], meta["n_items"] = self.n_users_, self.n_items_
        save_checkpoint(
            self.checkpoint_dir, step=sweep_idx + 1,
            state=dict(U=U, V=V,
                       history=np.asarray(self.history_, np.float32)),
            metadata=meta,
            wait=False,
        )

    def resume(self, checkpoint_dir: Optional[str] = None):
        """Load factors (and sweep history) from the latest checkpoint.

        Factors are sliced back to the true table sizes recorded in the
        checkpoint metadata (sharded fits checkpoint shard-padded tables),
        so predict()/score()/recommend(exclude_seen=False) work directly.
        LIMITATION: the training observation lists are NOT checkpointed
        (they are the input data, 100+ MB at ML-25M scale), so a resumed
        estimator cannot honor ``recommend(exclude_seen=True)`` until the
        next ``fit`` call re-supplies them — recommend() warns and serves
        unfiltered in that case."""
        from recommendation_models_tpu.utils.checkpoint import load_latest
        step, state = load_latest(checkpoint_dir or self.checkpoint_dir)
        # drop a PREVIOUS fit's serving state: its training indices and
        # compiled programs describe different data/factors, and their
        # presence would silently bypass the documented cannot-exclude
        # warning (r4 review)
        self.__dict__.pop("_train_indptr", None)
        self.__dict__.pop("_train_indices", None)
        self._sharded_program = None
        self._take_jit = None
        self.__dict__.pop("exchange_bytes_per_sweep_", None)
        meta = state.get("metadata") or {}
        U = np.asarray(state["U"])
        V = np.asarray(state["V"])
        self.n_users_ = int(meta.get("n_users", U.shape[0]))
        self.n_items_ = int(meta.get("n_items", V.shape[0]))
        self.U_ = U[: self.n_users_]
        self.V_ = V[: self.n_items_]
        self.history_ = list(np.asarray(state["history"]))
        return step

    # ------------------------------------------------------------------
    def __getstate__(self):
        """Picklable fitted estimator (the reference's persistence story —
        SURVEY.md §5 checkpoint row: 'at most pickling the fitted
        estimator'). Compiled sharded programs hold device handles and are
        rebuilt on the next fit, so they're dropped."""
        state = dict(self.__dict__)
        state.pop("_sharded_program", None)
        state.pop("_take_jit", None)   # jitted closures don't pickle
        state.pop("_vdev_cache", None)  # device arrays re-upload lazily
        state.pop("_vserve_cache", None)  # permuted serving table ditto
        if state.get("_U_dev") is not None:
            # materialize device-resident factors before dropping handles
            state["_U_host"], state["_V_host"] = self.U_, self.V_
        state.pop("_U_dev", None)
        state.pop("_V_dev", None)
        return state

    def _check_fitted(self):
        if self._U_host is None and self._U_dev is None:
            raise RuntimeError("this ALS instance is not fitted yet")

    def predict(self, users, items=None) -> np.ndarray:
        """Predicted ratings for (user, item) pairs.

        Accepts `predict(pairs)` with an (n, 2) array or `predict(u, i)`.
        """
        self._check_fitted()
        if items is None:
            pairs = np.asarray(users)
            users, items = pairs[:, 0], pairs[:, 1]
        users = np.asarray(users, np.int64)
        items = np.asarray(items, np.int64)
        return np.einsum("ok,ok->o", self.U_[users], self.V_[items])

    def fold_in(self, R_new, side: str = "user") -> np.ndarray:
        """Factors for NEW rows against the FIXED fitted opposite table —
        the standard ALS fold-in for serving fresh users (or items)
        without a refit. One ridge solve per new row, batched through the
        same jitted half-sweep machinery as training.

        ``R_new``: (n_new, n_items) ratings for ``side='user'`` (columns
        index the TRAINED item space), or (n_users, n_new) for
        ``side='item'``. Returns the (n_new, rank) factor block; scoring
        is then ``x_new @ V_.T`` (or ``U_ @ y_new.T``).
        """
        self._check_fitted()
        if side not in ("user", "item"):
            raise ValueError(f"side must be 'user' or 'item', got {side!r}")
        from recommendation_models_tpu.ops.pallas.cholesky import block_batch
        from recommendation_models_tpu.solver.als_sweep import half_sweep
        indptr, indices, data, a, b = csr_arrays(R_new)
        # dimension check BEFORE the O(nnz) host layout build (r4 review)
        if side == "item" and a != self.n_users_:
            raise ValueError(f"R_new has {a} rows but the fitted user "
                             f"space is {self.n_users_}")
        if side == "user" and b != self.n_items_:
            raise ValueError(f"R_new has {b} columns but the fitted "
                             f"item space is {self.n_items_}")
        if side == "item":
            rows = np.repeat(np.arange(a), np.diff(indptr))
            layout = layout_from_coo(
                rows, indices, data, a, b,
                DataConfig(dense_whales=False, hot_cols=0), transpose=True)
            n_new, opp = b, jnp.asarray(self.U_)
        else:
            layout = build_layout(
                indptr, indices, data, a, b,
                DataConfig(dense_whales=False, hot_cols=0))
            n_new, opp = a, jnp.asarray(self.V_)
        buckets = device_buckets(layout, block_batch(self.rank))
        cfg = self._solve_config()
        x = half_sweep(opp, buckets, n_new, cfg)
        return np.asarray(x)

    def predict_all(self, user: int) -> np.ndarray:
        """Scores for every item for one user (reference `predict_all`)."""
        self._check_fitted()
        return self.U_[user] @ self.V_.T

    def rmse(self, R) -> float:
        indptr, indices, data, _, _ = csr_arrays(R)
        users = np.repeat(np.arange(len(indptr) - 1), np.diff(indptr))
        pred = self.predict(users, indices)
        return float(np.sqrt(np.mean((data - pred) ** 2)))

    def score(self, R, y=None) -> float:
        """Negative RMSE over the observed entries of R (higher is better)."""
        return -self.rmse(R)

    def recommend(self, user_ids, n: int = 10, exclude_seen: bool = True,
                  method: str = "auto", recall_target: float = 0.99):
        """Top-n unseen items per user (reference `top_n`, SURVEY.md §3.2).

        Returns (scores (B, n), items (B, n)) as NumPy arrays.

        `method='approx'` uses TPU-native `lax.approx_max_k` retrieval
        (default on TPU for large catalogs — ~250x faster than a full
        sort, recall >= `recall_target`); `method='exact'` forces the
        exact blocked top-k.
        """
        self._check_fitted()
        user_ids = np.atleast_1d(np.asarray(user_ids, np.int64))
        if user_ids.size and (user_ids.min() < 0
                              or user_ids.max() >= self.n_users_):
            # the sharded path gathers from the PADDED device table with
            # jnp.take (fill mode): out-of-range ids would silently serve
            # NaN/padding rows (r4 review); the host path would raise a
            # bare IndexError — validate uniformly instead
            raise ValueError(
                f"user ids must be in [0, {self.n_users_}); got "
                f"[{user_ids.min()}, {user_ids.max()}]")
        n = min(n, self.n_items_)    # never ask top_k for more than exists
        query_rows, topk = self._topk_backend(method, recall_target)
        if exclude_seen and not hasattr(self, "_train_indptr"):
            # resumed-from-checkpoint estimators have factors but not the
            # training observation lists (see resume()): serving silently
            # WITH seen items would break the reference top_n contract.
            import warnings
            warnings.warn(
                "recommend(exclude_seen=True) on an estimator without "
                "training indices (e.g. resumed from a checkpoint): seen "
                "items canNOT be excluded; serving unfiltered scores. "
                "Call fit() to restore exclusion.", stacklevel=2)
        if not (exclude_seen and hasattr(self, "_train_indptr")):
            scores, items = topk(query_rows(user_ids), n, None)
            return np.asarray(scores), np.asarray(items)

        # degree-bucketed exclusion (ops.topk): one whale user must not
        # drag every row's overfetch to near-catalog width
        from recommendation_models_tpu.ops.topk import grouped_exclusion_topk
        return grouped_exclusion_topk(user_ids, n, self._train_indptr,
                                      self._train_indices, query_rows, topk)

    def _topk_backend(self, method: str, recall_target: float):
        """(query_rows, topk) callables for recommend().

        After a sharded fit whose tables are still device-resident, serving
        stays ON THE MESH (SURVEY.md §3.5, N9): query rows come from a jitted
        cross-shard gather of the sharded U (a (B, k) result — never a full
        table), and scoring runs through ops.topk.sharded_topk against the
        row-sharded V. Otherwise: host U_ rows + single-device topk_scores.
        """
        import jax
        from recommendation_models_tpu.ops.topk import (
            permuted_topk, serving_permutation)
        prog = getattr(self, "_sharded_program", None)
        if self._V_dev is not None and prog is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            from recommendation_models_tpu.ops.topk import sharded_topk
            U_dev, V_dev = self._U_dev, self._V_dev
            mesh, axis, n_items = prog.mesh, prog.axis, self.n_items_
            # cache the jitted gather on the estimator: a fresh closure per
            # recommend() call would recompile every call (r4 review —
            # same class as the topk module-level jit fix)
            take = getattr(self, "_take_jit", None)
            if take is None:
                take = self._take_jit = jax.jit(
                    lambda U, ids: jnp.take(U, ids, axis=0),
                    out_shardings=NamedSharding(mesh, P()))

            def query_rows(ids):
                return take(U_dev, jnp.asarray(ids))

            # SERVING table = the fit's device-resident V re-gathered in
            # permuted row order (one-time sharded take, cached; rows
            # >= n_items stay the zero padding tail, still masked by
            # n_valid). Catalog-id order correlates with popularity, which
            # breaks approx_max_k's recall guarantee — see
            # ops.topk.serving_permutation (r5 serving-quality ledger).
            perm_back, perm_fwd = serving_permutation(n_items)
            cache = getattr(self, "_vserve_cache", None)
            if cache is None or cache[0] is not V_dev:
                per_total = V_dev.shape[0]
                ids = np.concatenate(
                    [perm_back, np.arange(n_items, per_total)])
                take_v = jax.jit(
                    lambda V, ids: jnp.take(V, ids, axis=0),
                    out_shardings=NamedSharding(mesh, P(axis, None)))
                self._vserve_cache = (V_dev, take_v(V_dev,
                                                    jnp.asarray(ids)))
            V_serve = self._vserve_cache[1]

            def topk(Uq, k, excl):
                return sharded_topk(Uq, V_serve, k, mesh, axis=axis,
                                    exclude=excl, method=method,
                                    recall_target=recall_target,
                                    n_valid=n_items)
            return query_rows, permuted_topk(topk, perm_back, perm_fwd)

        # cache the device copy of the catalog across serving calls: a
        # fresh jnp.asarray per call re-uploads the full table (ML-25M:
        # ~40 MB, tens of ms over the remote tunnel) on every recommend()
        # (r4 review). Keyed on the host array's identity; the V_ setter
        # invalidates. Rows are held in PERMUTED order (decorrelates id
        # order from score rank — approx_max_k's recall guarantee assumes
        # uniformly-arranged winners; ops.topk.serving_permutation).
        perm_back, perm_fwd = serving_permutation(self.n_items_)
        cache = getattr(self, "_vdev_cache", None)
        if cache is None or cache[0] is not self.V_:
            self._vdev_cache = (self.V_, jnp.asarray(self.V_[perm_back]))
        V_local = self._vdev_cache[1]

        def query_rows(ids):
            return jnp.asarray(self.U_[ids])

        def topk(Uq, k, excl):
            return topk_scores(Uq, V_local, k, excl, method=method,
                               recall_target=recall_target)
        return query_rows, permuted_topk(topk, perm_back, perm_fwd)

    def top_n(self, user: int, n: int = 10, exclude_seen: bool = True):
        """Single-user convenience: ranked item ids."""
        _, items = self.recommend([user], n, exclude_seen)
        return items[0]


__all__ = ["ALS"]
