"""Observation-parallel ALS on the 2-D hybrid (DCN x ICI) mesh
(SURVEY.md §2.2 N6 'hybrid ICI x DCN mesh').

The PRODUCTION topology for MovieLens-shaped ALS is the slice-major 1-D
mesh (`parallel.mesh.get_mesh(num_slices=...)` + XLA hierarchical
collectives): rows split across ALL devices, the opposite table gathered
per half-sweep, DCN carrying only each slice's share of the table. This
module is the explicit-hierarchy alternative for the OPPOSITE regime — few
rows x enormous degrees (SURVEY.md §5's "long-context" analog) — where
replicating per-row GRAM matrices over DCN undercuts replicating the
opposite TABLE:

  mesh (dcn=D, data=P)          parallel.mesh.get_hybrid_mesh
  U, V                          row-sharded over 'data' within a slice,
                                replicated across 'dcn'
  observations                  split across 'dcn': each slice holds ~1/D
                                of every row-shard's bucket rows (legal by
                                the repo invariant that buckets may repeat
                                row ids and gram consumers scatter-ADD)
  per half-sweep                all_gather(V) INTRA-slice (ICI);
                                per-row gram/rhs from the local obs subset;
                                psum over 'dcn' (the ONLY DCN collective);
                                every slice solves its row shard on the
                                identical psum'd systems (replicated solve
                                — no broadcast needed)

Per-device DCN bytes/half-sweep = 2 (D-1)/D * rows_local * (k^2 + k) * 4,
vs the 1-D hierarchical allgather's (D-1)/D * cols * k * 4 / (P/hosts) —
the 2-D form wins when average degree >> k * P (quantified by
`parallel.scaling.choose_topology`; on ML-25M shapes 1-D wins by ~2 orders
of magnitude, which is why `ALS(n_shards=...)` uses the 1-D program).

Dense-whale / hot-column blocks are not supported here (their value rows
span all global columns per whale — build layouts with
DataConfig(dense_whales=False, hot_cols=0), as the exchange modes do).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map  # type: ignore

from recommendation_models_tpu.config import SolveConfig
from recommendation_models_tpu.data.layout import ShardedLayout
from recommendation_models_tpu.ops.gram import gram_rhs, objective_weights
from recommendation_models_tpu.ops.solve import (resolve_compute_dtype,
                                                 solve_spd_flat)


def split_layout_slices(layout: ShardedLayout, n_slices: int):
    """Split each bucket's rows across ``n_slices`` DCN slices.

    Returns per-bucket dicts of (D, S, Bd, ...) arrays (row_ids keep the
    ``rows_per_shard`` sentinel on padding rows). Row blocks are dealt
    round-robin so Zipf-ordered buckets spread whales evenly.
    """
    if layout.dense_ids is not None or layout.hot_ids is not None:
        raise ValueError(
            "hybrid 2-D ALS: dense-whale / hot-column blocks need the full "
            "opposite table per device — build the layout with "
            "DataConfig(dense_whales=False, hot_cols=0)")
    D = n_slices
    out = []
    for rid, idx, val, msk in zip(layout.row_ids, layout.indices,
                                  layout.values, layout.mask):
        S, B, pad = idx.shape
        bd = max(1, -(-B // D))
        bd = -(-bd // 8) * 8

        def sp(a, fill=0):
            a4 = np.full((D, S) + (bd,) + a.shape[2:], fill, a.dtype)
            flat = np.arange(B)
            d_of, pos = flat % D, flat // D          # round-robin deal
            a4[d_of, :, pos] = np.swapaxes(a, 0, 1)[flat]
            return a4

        out.append(dict(
            row_ids=sp(rid, fill=layout.rows_per_shard),
            indices=sp(idx), values=sp(val), mask=sp(msk)))
    return tuple(out)


class HybridALSProgram:
    """Compiled observation-parallel ALS for one (layout, 2-D mesh, cfg)."""

    def __init__(self, user_layout: ShardedLayout,
                 item_layout: ShardedLayout, mesh: Mesh, cfg: SolveConfig):
        if len(mesh.axis_names) != 2:
            raise ValueError(f"need a 2-D (dcn, data) mesh, got "
                             f"{mesh.axis_names}")
        self.mesh = mesh
        self.dcn_axis, self.axis = mesh.axis_names
        D = mesh.shape[self.dcn_axis]
        S = mesh.shape[self.axis]
        if user_layout.n_shards != S or item_layout.n_shards != S:
            raise ValueError("layout shard count must equal the mesh's "
                             "'data' axis size")
        import dataclasses as _dc
        mesh_platform = mesh.devices.flat[0].platform
        if cfg.solver == "auto":
            cfg = _dc.replace(
                cfg, solver="pallas" if mesh_platform == "tpu" else "xla")
        if cfg.compute_dtype == "auto":
            cfg = _dc.replace(
                cfg, compute_dtype=("bfloat16" if mesh_platform == "tpu"
                                    else "float32"))
        self.cfg = cfg
        self.n_slices = D
        self.n_shards = S
        self.n_users = user_layout.n_rows
        self.n_items = item_layout.n_rows
        self.upr = user_layout.rows_per_shard
        self.ipr = item_layout.rows_per_shard

        ub_h = split_layout_slices(user_layout, D)
        ib_h = split_layout_slices(item_layout, D)

        dcn, data = self.dcn_axis, self.axis

        def put4(x):
            x = np.asarray(x)
            spec = P(dcn, data, *([None] * (x.ndim - 2)))
            sharding = NamedSharding(mesh, spec)
            return jax.make_array_from_callback(
                x.shape, sharding, lambda idx: x[idx])

        self._ub = jax.tree.map(put4, ub_h)
        self._ib = jax.tree.map(put4, ib_h)
        bspec_u = jax.tree.map(
            lambda x: P(dcn, data, *([None] * (x.ndim - 2))), self._ub)
        bspec_i = jax.tree.map(
            lambda x: P(dcn, data, *([None] * (x.ndim - 2))), self._ib)
        table_spec = P(data, None)
        upr, ipr = self.upr, self.ipr

        def local(buckets):
            return tuple(
                dict(row_ids=b["row_ids"][0, 0], indices=b["indices"][0, 0],
                     values=b["values"][0, 0], mask=b["mask"][0, 0])
                for b in buckets)

        def half(V_loc, buckets, rows_local, return_gathered=False):
            """One orientation's half-sweep on this device; the solve runs
            replicated across 'dcn' on identical psum'd systems.
            ``return_gathered`` also hands back the intra-slice gathered
            opposite table so a post-sweep SSE can reuse it (zero extra
            collectives — VERDICT r3 task 3)."""
            from recommendation_models_tpu.solver.als_sweep import (
                resolve_gather_budget)
            k = V_loc.shape[-1]
            dtype = jnp.dtype(resolve_compute_dtype(cfg.compute_dtype))
            # opposite table: intra-slice ICI gather ('data' axis only —
            # the table is replicated across 'dcn' by its sharding)
            V_full = jax.lax.all_gather(V_loc, data, axis=0, tiled=True)
            G = jnp.zeros((rows_local + 1, k * k), jnp.float32)
            rhs = jnp.zeros((rows_local + 1, k), jnp.float32)
            deg = jnp.zeros((rows_local + 1,), jnp.float32)
            lb = local(buckets)
            budget_mb = resolve_gather_budget(cfg.gather_budget_mb, k, lb)
            for b in lb:
                wg, wr = objective_weights(b["values"], b["mask"], cfg.alpha)
                rid = b["row_ids"]
                bsz, p = b["indices"].shape
                # gathered (rows, chunk, k) temps stay under the budget via
                # row-block scans (the repo-wide invariant — CLAUDE.md;
                # same scheme as solver.als_sweep.solve_all_buckets)
                bb = max(8, budget_mb * (1 << 20)
                         // (min(p, cfg.chunk) * k * dtype.itemsize)
                         // 8 * 8)
                if bsz <= bb:
                    g, r = gram_rhs(V_full, b["indices"], wg, wr,
                                    chunk=cfg.chunk, compute_dtype=dtype)
                    G = G.at[rid].add(g.reshape(bsz, k * k))
                    rhs = rhs.at[rid].add(r)
                    deg = deg.at[rid].add(b["mask"].sum(-1))
                    continue
                n_bb = -(-bsz // bb)
                pad = n_bb * bb - bsz
                idx_s = jnp.pad(b["indices"], ((0, pad), (0, 0))
                                ).reshape(n_bb, bb, p)
                wg_s = jnp.pad(wg, ((0, pad), (0, 0))).reshape(n_bb, bb, p)
                wr_s = jnp.pad(wr, ((0, pad), (0, 0))).reshape(n_bb, bb, p)
                msk_s = jnp.pad(b["mask"], ((0, pad), (0, 0))
                                ).reshape(n_bb, bb, p)
                rid_s = jnp.pad(rid, (0, pad), constant_values=rows_local
                                ).reshape(n_bb, bb)

                def body(carry, xs):
                    G, rhs, deg = carry
                    rid_b, idx_b, wg_b, wr_b, msk_b = xs
                    g, r = gram_rhs(V_full, idx_b, wg_b, wr_b,
                                    chunk=cfg.chunk, compute_dtype=dtype)
                    G = G.at[rid_b].add(g.reshape(bb, k * k))
                    rhs = rhs.at[rid_b].add(r)
                    deg = deg.at[rid_b].add(msk_b.sum(-1))
                    return (G, rhs, deg), None

                (G, rhs, deg), _ = jax.lax.scan(
                    body, (G, rhs, deg), (rid_s, idx_s, wg_s, wr_s, msk_s))
            # THE one DCN collective: per-row normal equations, not tables
            G = jax.lax.psum(G, dcn)
            rhs = jax.lax.psum(rhs, dcn)
            if cfg.reg_by_degree:
                deg = jax.lax.psum(deg, dcn)
                reg_vec = cfg.reg * jnp.maximum(deg, 1.0)
            else:
                reg_vec = jnp.full((rows_local + 1,), cfg.reg, jnp.float32)
            if cfg.reg == 0 and cfg.alpha is None:
                # reg=0: zero-degree (padded/empty) rows have G=0, rhs=0;
                # chol(0) NaNs — any positive ridge solves them to exactly
                # 0, so floor it (statically gated; see solver.als_sweep)
                deg_g = deg if cfg.reg_by_degree else jax.lax.psum(deg, dcn)
                reg_vec = jnp.where(deg_g > 0, reg_vec, 1.0)
            if cfg.alpha is not None:
                # global gramian: V is replicated across 'dcn', so the
                # 'data' psum alone completes V^T V (SURVEY.md N7)
                g0 = jax.lax.psum(
                    jnp.einsum("nk,nl->kl", V_loc, V_loc,
                               preferred_element_type=jnp.float32), data)
                G = G + g0.reshape(-1)[None, :]
            x = solve_spd_flat(G[:rows_local], rhs[:rows_local], k,
                               cfg.solver, reg_vec=reg_vec[:rows_local])
            if return_gathered:
                return x, V_full
            return x

        def sweep_body(U_loc, V_loc, ub, ib):
            U_new = half(V_loc, ub, upr)
            V_new = half(U_new, ib, ipr)
            return U_new, V_new

        def sweep_sse_body(U_loc, V_loc, ub, ib):
            from recommendation_models_tpu.solver.als_sweep import masked_sse
            U_new = half(V_loc, ub, upr)
            V_new, U_full = half(U_new, ib, ipr, return_gathered=True)
            # post-sweep residual over the ITEM orientation's local
            # observation subset, reusing the item half's gathered U — the
            # only extra collective is the scalar double psum
            s = masked_sse(V_new, U_full, local(ib), chunk=cfg.chunk,
                           gather_budget_mb=cfg.gather_budget_mb)
            return U_new, V_new, jax.lax.psum(jax.lax.psum(s, data), dcn)

        def sse_body(U_loc, V_loc, ub):
            from recommendation_models_tpu.solver.als_sweep import masked_sse
            V_full = jax.lax.all_gather(V_loc, data, axis=0, tiled=True)
            s = masked_sse(U_loc, V_full, local(ub), chunk=cfg.chunk,
                           gather_budget_mb=cfg.gather_budget_mb)
            # observations partition uniquely over (dcn, data): the double
            # psum is the global residual
            return jax.lax.psum(jax.lax.psum(s, data), dcn)

        self._sweep_sse_sm = shard_map(
            sweep_sse_body, mesh=mesh,
            in_specs=(table_spec, table_spec, bspec_u, bspec_i),
            out_specs=(table_spec, table_spec, P()),
            check_vma=False,
        )
        self._sweep = jax.jit(shard_map(
            sweep_body, mesh=mesh,
            in_specs=(table_spec, table_spec, bspec_u, bspec_i),
            out_specs=(table_spec, table_spec),
            check_vma=False,
        ), donate_argnums=(0, 1))
        self._sse = jax.jit(shard_map(
            sse_body, mesh=mesh,
            in_specs=(table_spec, table_spec, bspec_u),
            out_specs=P(),
            check_vma=False,
        ))

    # ------------------------------------------------------------------
    def _place(self, U, V):
        sharding = NamedSharding(self.mesh, P(self.axis, None))
        return (jax.make_array_from_callback(U.shape, sharding,
                                             lambda idx: U[idx]),
                jax.make_array_from_callback(V.shape, sharding,
                                             lambda idx: V[idx]))

    def init_factors(self, seed: int, init_scale: float):
        rng = np.random.default_rng(seed)
        k = self.cfg.rank
        U = init_scale * rng.standard_normal(
            (self.upr * self.n_shards, k)).astype(np.float32)
        V = init_scale * rng.standard_normal(
            (self.ipr * self.n_shards, k)).astype(np.float32)
        U[self.n_users:] = 0.0
        V[self.n_items:] = 0.0
        return self._place(U, V)

    def place_factors(self, U0, V0):
        k = self.cfg.rank
        U = np.zeros((self.upr * self.n_shards, k), np.float32)
        V = np.zeros((self.ipr * self.n_shards, k), np.float32)
        U[: self.n_users] = np.asarray(U0, np.float32)
        V[: self.n_items] = np.asarray(V0, np.float32)
        return self._place(U, V)

    def sweep(self, U, V):
        return self._sweep(U, V, self._ub, self._ib)

    def sweep_with_sse(self, U, V):
        """One sweep + the post-sweep global SSE (reuses the item half's
        intra-slice gather; only a scalar psum extra)."""
        if not hasattr(self, "_sweep_sse_jit"):
            self._sweep_sse_jit = jax.jit(self._sweep_sse_sm,
                                          donate_argnums=(0, 1))
        return self._sweep_sse_jit(U, V, self._ub, self._ib)

    def train_sse(self, U, V):
        return self._sse(U, V, self._ub)

    def make_fit(self, n_sweeps: int, tol: float = 0.0, nnz: int = 1):
        """The whole 2-D hybrid fit as ONE jitted device program (scan over
        sweeps / device-side tol while_loop); same contract as
        ``ShardedALSProgram.make_fit``."""
        from recommendation_models_tpu.solver.als_sweep import (
            make_scanned_program_fit)
        return make_scanned_program_fit(
            self._sweep_sse_sm, n_sweeps, tol, nnz, (self._ub, self._ib))

    def collective_bytes_per_sweep(self):
        """Analytic per-DEVICE bytes per sweep, split by fabric: the
        intra-slice table gathers (ICI) and the cross-slice gram psum (the
        only DCN traffic). Feeds parallel.scaling.choose_topology."""
        k = self.cfg.rank
        S, D = self.n_shards, self.n_slices
        ici = (S - 1) * (self.ipr + self.upr) * k * 4   # both halves' gathers
        dcn = 0
        if D > 1:
            rows = self.upr + self.ipr
            # G (k^2) + rhs (k) per row; the degree vector (+1) is only
            # psum'd under reg_by_degree
            per_row = k * k + k + (1 if self.cfg.reg_by_degree else 0)
            dcn = int(2 * (D - 1) / D * rows * per_row * 4)
        out = dict(ici=ici, dcn=dcn, per_sweep_total=ici + dcn)
        out["sse_extra"] = (S - 1) * self.ipr * k * 4
        out["per_sweep_with_sse"] = out["per_sweep_total"] + out["sse_extra"]
        return out


__all__ = ["HybridALSProgram", "split_layout_slices"]
