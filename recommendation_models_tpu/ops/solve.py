"""Batched SPD solves — the reference's `scipy.linalg.solve`/`lstsq` per row
(SURVEY.md §2.1 row 4) becomes one batched Cholesky factorization + two
triangular solves over a whole bucket.

Paths:
  'auto'   'pallas' on a TPU backend, 'xla' elsewhere (the default)
  'xla'    jnp.linalg.cholesky + lax triangular_solve (correctness anchor)
  'pallas' fused Pallas batched-Cholesky kernel (ops/pallas/cholesky.py) —
           ~19x faster than the XLA path at (8192, 64, 64) on v5e
  'lu'     jnp.linalg.solve (LU) — robustness fallback for ill-conditioned G
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _default_platform() -> str:
    dev = jax.config.jax_default_device
    platform = getattr(dev, "platform", None) if dev is not None else None
    return platform if platform is not None else jax.default_backend()


def resolve_solver(solver: str) -> str:
    """Resolve 'auto' to the best path for the current backend."""
    if solver != "auto":
        return solver
    return "pallas" if _default_platform() == "tpu" else "xla"


def resolve_compute_dtype(dtype: str) -> str:
    """'auto' -> bf16 matmul inputs on TPU (half the gather HBM traffic,
    double MXU rate; f32 accumulation keeps quality within run-to-run
    variance — measured), f32 elsewhere (bitwise-stable CPU CI)."""
    if dtype != "auto":
        return dtype
    return "bfloat16" if _default_platform() == "tpu" else "float32"


def add_ridge(G: jnp.ndarray, reg, degrees=None) -> jnp.ndarray:
    """G + reg*I, optionally scaling reg per row by its degree (the
    'weighted-lambda' ALS variant)."""
    k = G.shape[-1]
    eye = jnp.eye(k, dtype=G.dtype)
    if degrees is None:
        return G + reg * eye
    scale = reg * jnp.maximum(degrees, 1.0)
    return G + scale[..., None, None] * eye


def solve_spd(G: jnp.ndarray, rhs: jnp.ndarray, solver: str = "xla") -> jnp.ndarray:
    """Solve ``G x = rhs`` for a batch of SPD systems.

    G: (..., k, k), rhs: (..., k) -> x: (..., k).
    """
    solver = resolve_solver(solver)
    if solver == "pallas":
        from recommendation_models_tpu.ops.pallas.cholesky import cholesky_solve
        return cholesky_solve(G, rhs)
    if solver == "lu":
        return jnp.linalg.solve(G, rhs[..., None])[..., 0]
    if solver != "xla":
        raise ValueError(f"unknown solver {solver!r}")
    L = jnp.linalg.cholesky(G)
    y = jax.lax.linalg.triangular_solve(
        L, rhs[..., None], left_side=True, lower=True, transpose_a=False)
    x = jax.lax.linalg.triangular_solve(
        L, y, left_side=True, lower=True, transpose_a=True)
    return x[..., 0]


def solve_spd_flat(G_flat: jnp.ndarray, rhs: jnp.ndarray, k: int,
                   solver: str = "auto", reg_vec=None) -> jnp.ndarray:
    """Solve with FLAT (B, k*k) row-major systems — avoids the 2x XLA tile
    padding a big (B, k, k) f32 array pays when k < 128 lanes. The Pallas
    path stays padding-free end to end; other paths reshape (small inputs
    only — CPU tests / fallbacks).

    ``reg_vec`` (B,): per-system ridge, applied inside the Pallas kernel
    (fused with the load) or via flat_ridge on the fallback paths."""
    solver = resolve_solver(solver)
    if solver == "pallas" and k % 8 == 0:
        from recommendation_models_tpu.ops.pallas.cholesky import (
            cholesky_solve_flat)
        return cholesky_solve_flat(G_flat, rhs, k, reg_vec=reg_vec)
    G_flat = G_flat.astype(jnp.float32)   # bf16 G storage: upcast to solve
    if reg_vec is not None:
        G_flat = G_flat + (jnp.asarray(reg_vec, G_flat.dtype)[:, None]
                           * jnp.eye(k, dtype=G_flat.dtype).reshape(-1))
    b = G_flat.shape[0]
    return solve_spd(G_flat.reshape(b, k, k), rhs, solver)


def flat_ridge(G_flat: jnp.ndarray, k: int, reg, degrees=None) -> jnp.ndarray:
    """add_ridge on flat (B, k*k) systems."""
    eye_flat = jnp.eye(k, dtype=G_flat.dtype).reshape(-1)
    if degrees is None:
        return G_flat + reg * eye_flat
    scale = reg * jnp.maximum(degrees, 1.0)
    return G_flat + scale[:, None] * eye_flat


__all__ = ["solve_spd", "solve_spd_flat", "add_ridge", "flat_ridge",
           "resolve_solver", "resolve_compute_dtype"]
