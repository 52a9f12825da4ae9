"""IMC — inductive matrix completion estimator (SURVEY.md §2.1 row 7, N8).

Model: ``r_ui ≈ x_u^T W H^T y_i`` with dense side-feature matrices X (users)
and Y (items); handles cold-start rows through their features. Objective
(SURVEY.md §3.3): ``½‖P_Ω(R − X W H^T Y^T)‖² + λ/2(‖W‖² + ‖H‖²)``.

TPU-native training: alternating minimization; each quadratic subproblem is
solved by conjugate gradients whose matvec is two dense matmuls (MXU) plus a
gather/segment-sum over the observation list — all inside one jitted sweep.
Observations shard data-parallel along the 'data' mesh axis with X/Y/W/H
replicated (SURVEY.md [B:5] "IMC side-feature projections run data-parallel
on the dense mesh"); GSPMD inserts the psum for the segment reductions.
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


def _cg(matvec, b, x0, iters):
    """Plain CG, jit-friendly (fixed iteration count via fori_loop)."""
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

    r0 = b - matvec(x0)
    out = jax.lax.fori_loop(0, iters, body, (x0, r0, r0, jnp.vdot(r0, r0)))
    return out[0]


class IMC(BaseEstimator):
    """Inductive matrix completion with side features, sklearn-style."""

    def __init__(
        self,
        rank: int = 8,
        reg: float = 0.1,
        n_sweeps: int = 10,
        cg_iters: int = 50,
        seed: int = 0,
        init_scale: float = 0.1,
        n_shards: Optional[int] = None,
        platform: Optional[str] = None,
        verbose: int = 0,
    ):
        self.rank = rank
        self.reg = reg
        self.n_sweeps = n_sweeps
        self.cg_iters = cg_iters
        self.seed = seed
        self.init_scale = init_scale
        self.n_shards = n_shards
        self.platform = platform
        self.verbose = verbose

    # ------------------------------------------------------------------
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

        # pad the observation list to a multiple of 8 * n_shards
        mult = 8 * (self.n_shards or 1)
        n_obs = users.shape[0]
        pad = (-n_obs) % mult
        w = np.concatenate([np.ones(n_obs, np.float32), np.zeros(pad, np.float32)])
        users_p = np.concatenate([users, np.zeros(pad, np.int32)])
        items_p = np.concatenate([items, np.zeros(pad, np.int32)])
        ratings_p = np.concatenate([ratings, np.zeros(pad, np.float32)])

        obs = dict(u=jnp.asarray(users_p), i=jnp.asarray(items_p),
                   r=jnp.asarray(ratings_p), w=jnp.asarray(w))
        if self.n_shards and self.n_shards > 1:
            from jax.sharding import NamedSharding, PartitionSpec as P
            from recommendation_models_tpu.parallel.mesh import get_mesh
            mesh = get_mesh(self.n_shards, platform=self.platform)
            data_sh = NamedSharding(mesh, P(mesh.axis_names[0]))
            repl = NamedSharding(mesh, P())
            obs = {k: jax.device_put(v, data_sh) for k, v in obs.items()}
            X = jax.device_put(X, repl)
            Y = jax.device_put(Y, repl)

        reg, cg_iters = float(self.reg), int(self.cg_iters)

        def solve_factor(F, Z, u, i, r, w, M0):
            """min over M of the quadratic with rows F[u], cols Z[i]."""
            n_rows = F.shape[0]

            def matvec(Mf):
                M = Mf.reshape(M0.shape)
                S = F @ M                                   # dense tower (MXU)
                s_obs = jnp.einsum("ok,ok->o", S[u], Z[i]) * w
                acc = jax.ops.segment_sum(s_obs[:, None] * Z[i], u,
                                          num_segments=n_rows)
                return (F.T @ acc + reg * M).ravel()

            acc0 = jax.ops.segment_sum((r * w)[:, None] * Z[i], u,
                                       num_segments=n_rows)
            b = (F.T @ acc0).ravel()
            return _cg(matvec, b, M0.ravel(), cg_iters).reshape(M0.shape)

        @jax.jit
        def sweep(W, H, X, Y, u, i, r, w):
            W = solve_factor(X, Y @ H, u, i, r, w, W)
            H = solve_factor(Y, X @ W, i, u, r, w, H)
            return W, H

        @jax.jit
        def sse(W, H, X, Y, u, i, r, w):
            pred = jnp.einsum("ok,ok->o", (X @ W)[u], (Y @ H)[i])
            return jnp.sum(w * (r - pred) ** 2)

        rng = np.random.default_rng(self.seed)
        k = self.rank
        W = (jnp.asarray(W0, jnp.float32) if W0 is not None else
             jnp.asarray(self.init_scale
                         * rng.standard_normal((X.shape[1], k)), jnp.float32))
        H = (jnp.asarray(H0, jnp.float32) if H0 is not None else
             jnp.asarray(self.init_scale
                         * rng.standard_normal((Y.shape[1], k)), jnp.float32))

        self.history_ = []
        for s in range(self.n_sweeps):
            W, H = sweep(W, H, X, Y, obs["u"], obs["i"], obs["r"], obs["w"])
            err = float(sse(W, H, X, Y, obs["u"], obs["i"], obs["r"], obs["w"]))
            obj = 0.5 * err + 0.5 * reg * float(
                jnp.sum(W ** 2) + jnp.sum(H ** 2))
            self.history_.append(obj)
            if self.verbose:
                print(f"[IMC] sweep {s + 1}: objective={obj:.6f}")

        self.W_ = np.asarray(W)
        self.H_ = np.asarray(H)
        self._X, self._Y = np.asarray(X), np.asarray(Y)
        return self

    # ------------------------------------------------------------------
    def _check_fitted(self):
        if not hasattr(self, "W_"):
            raise RuntimeError("this IMC instance is not fitted yet")

    def predict(self, users, items, X=None, Y=None) -> np.ndarray:
        """Predict ratings; pass fresh X/Y rows for inductive cold-start
        entities (users/items then index into the given matrices)."""
        self._check_fitted()
        X = self._X if X is None else np.asarray(X, np.float32)
        Y = self._Y if Y is None else np.asarray(Y, np.float32)
        users = np.asarray(users, np.int64)
        items = np.asarray(items, np.int64)
        return np.einsum("ok,ok->o", X[users] @ self.W_, Y[items] @ self.H_)

    def rmse(self, R, X=None, Y=None) -> float:
        users, items, ratings = _as_triplets(R)
        pred = self.predict(users, items, X, Y)
        return float(np.sqrt(np.mean((ratings - pred) ** 2)))

    def score(self, R, X=None, Y=None) -> float:
        """Negative RMSE over observed entries (higher is better)."""
        return -self.rmse(R, X, Y)

    def recommend(self, user_ids, n: int = 10, X=None, Y=None):
        """Top-n items by bilinear score (cold-start capable via X/Y)."""
        self._check_fitted()
        X = self._X if X is None else np.asarray(X, np.float32)
        Y = self._Y if Y is None else np.asarray(Y, np.float32)
        user_ids = np.atleast_1d(np.asarray(user_ids, np.int64))
        s = (X[user_ids] @ self.W_) @ (Y @ self.H_).T
        items = np.argsort(-s, axis=1)[:, :n]
        return np.take_along_axis(s, items, axis=1), items


__all__ = ["IMC"]
