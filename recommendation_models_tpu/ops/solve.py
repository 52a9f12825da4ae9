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
    # jax accepts a plain STRING for jax_default_device ('cpu'): mirror
    # cholesky._use_interpret's str(dev) fallback or the resolvers pick
    # TPU settings (pallas + bf16) while the kernels interpret on CPU
    # (r4 review)
    dev = jax.config.jax_default_device
    if dev is not None:
        return getattr(dev, "platform", str(dev))
    return jax.default_backend()


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
    # normalize (..., k, k) to one flat batch axis: the pallas kernel and
    # the TPU chunking below are 3-D-only (2-D and 4-D+ inputs crashed on
    # the pallas branch and skipped the scoped-vmem chunking — r4 review)
    k = G.shape[-1]
    batch_shape = G.shape[:-2]
    G = G.reshape((-1,) + G.shape[-2:])
    rhs = rhs.reshape((-1, k))
    b = G.shape[0]
    if b == 0:
        return jnp.zeros(batch_shape + (k,), jnp.float32)

    def _restore(x):
        return x.reshape(batch_shape + (k,))

    if solver == "pallas":
        from recommendation_models_tpu.ops.pallas.cholesky import (
            cholesky_solve, pallas_supported)
        if pallas_supported(k, b):
            return _restore(cholesky_solve(G, rhs))
        solver = "xla"   # multi-block k>160: Mosaic lane limit (cholesky.py)
    if solver not in ("lu", "xla"):
        raise ValueError(f"unknown solver {solver!r}")
    # TPU's triangular_solve/LU lowerings stage ~2x the batch block in
    # scoped vmem (16 MB, not raisable): even (b=308, k=88) blew it on
    # v5e (shape-fuzz-found). Chunk the batch so each call stays bounded —
    # this is the robustness anchor/fallback path, not a tuned one.
    def _solve_block(Gb, rb):
        if solver == "lu":
            return jnp.linalg.solve(Gb, rb[..., None])[..., 0]
        L = jnp.linalg.cholesky(Gb)
        y = jax.lax.linalg.triangular_solve(
            L, rb[..., None], left_side=True, lower=True, transpose_a=False)
        x = jax.lax.linalg.triangular_solve(
            L, y, left_side=True, lower=True, transpose_a=True)
        return x[..., 0]

    if _default_platform() == "tpu":
        bc = max(8, (6 * 2**20) // (k * k * 8) // 8 * 8)
        if b > bc:
            # ONE traced body via lax.map (a Python loop of b/bc slices
            # inflated every sweep's compile at k>160 scale — r4 review);
            # identity-pad so padding systems factor cleanly
            pad = (-b) % bc
            if pad:
                tail = (jnp.arange(b + pad) >= b).astype(G.dtype)
                G = jnp.pad(G, ((0, pad), (0, 0), (0, 0))) + (
                    tail[:, None, None] * jnp.eye(k, dtype=G.dtype))
                rhs = jnp.pad(rhs, ((0, pad), (0, 0)))
            x = jax.lax.map(
                lambda ab: _solve_block(*ab),
                (G.reshape(-1, bc, k, k), rhs.reshape(-1, bc, k)))
            return _restore(x.reshape(-1, k)[:b])
    return _restore(_solve_block(G, rhs))


def solve_spd_flat(G_flat: jnp.ndarray, rhs: jnp.ndarray, k: int,
                   solver: str = "auto", reg_vec=None) -> jnp.ndarray:
    """Solve with FLAT (B, k*k) row-major systems — avoids the 2x XLA tile
    padding a big (B, k, k) f32 array pays when k < 128 lanes. The Pallas
    path stays padding-free end to end; other paths reshape (small inputs
    only — CPU tests / fallbacks).

    ``reg_vec`` (B,): per-system ridge, applied inside the Pallas kernel
    (fused with the load) or via flat_ridge on the fallback paths."""
    if G_flat.shape[0] == 0:
        return jnp.zeros((0, k), jnp.float32)
    solver = resolve_solver(solver)
    if solver == "pallas" and k % 8 == 0:
        from recommendation_models_tpu.ops.pallas.cholesky import (
            cholesky_solve_flat, pallas_supported)
        if pallas_supported(k, G_flat.shape[0]):
            return cholesky_solve_flat(G_flat, rhs, k, reg_vec=reg_vec)
    G_flat = G_flat.astype(jnp.float32)   # bf16 G storage: upcast to solve
    if reg_vec is not None:
        G_flat = G_flat + (jnp.asarray(reg_vec, G_flat.dtype)[:, None]
                           * jnp.eye(k, dtype=G_flat.dtype).reshape(-1))
    b = G_flat.shape[0]
    return solve_spd(G_flat.reshape(b, k, k), rhs, solver)


def solve_spd_t(Gt: jnp.ndarray, rhst: jnp.ndarray,
                solver: str = "auto", reg_vec=None,
                Gt2: jnp.ndarray = None) -> jnp.ndarray:
    """Solve with BATCH-MINOR systems: Gt (k, k, B), rhst (k, B) -> x (k, B).

    This is the Pallas kernel's native layout — producing it straight from
    the gram einsum (ops.gram.gram_rhs_t) skips the whole-array transpose a
    batch-major G would need. The xla/lu fallbacks transpose internally
    (CPU tests / correctness anchor only).

    ``reg_vec`` (B,): per-system ridge (fused with the load on the Pallas
    path). The batch is padded to a sublane multiple if needed; padding
    systems solve against the identity.

    ``Gt2``: optional second (k, k, B) additive gram term (the hot-column
    contribution). On the Pallas path it is summed in VMEM inside the
    kernel so XLA never materializes ``Gt + Gt2`` in HBM (an XLA-level add
    between two big matmul outputs forces relayout copies, measured ~26 ms
    per ML-25M bucket); fallbacks add normally.
    """
    k, _, b = Gt.shape
    if b == 0:
        return jnp.zeros((k, 0), jnp.float32)
    if reg_vec is None:
        regv = jnp.zeros((1, b), jnp.float32)
    else:
        regv = jnp.asarray(reg_vec, jnp.float32).reshape(1, b)
    solver = resolve_solver(solver)
    if solver == "pallas" and k % 8 == 0:
        from recommendation_models_tpu.ops.pallas.cholesky import (
            _cholesky_solve_t, _use_interpret, block_batch, pallas_supported)
        if not pallas_supported(k, b, two_operand=Gt2 is not None):
            return solve_spd_t(Gt, rhst, "xla", reg_vec=reg_vec, Gt2=Gt2)
        block = block_batch(k)
        if Gt2 is not None:
            # the 2-operand kernel halves its batch block: pad to multiples
            # of the EFFECTIVE block or the grid floors b//bt and systems
            # past the first block come back uninitialized
            block = max(block // 2 // 8 * 8, 8)
        bp = b if b <= block else -(-b // block) * block
        bp = -(-bp // 8) * 8
        if bp != b:
            eye = jnp.eye(k, dtype=Gt.dtype)
            Gt = jnp.pad(Gt, ((0, 0), (0, 0), (0, bp - b)))
            Gt = Gt + eye[:, :, None] * (jnp.arange(bp) >= b)[None, None, :
                                                              ].astype(Gt.dtype)
            rhst = jnp.pad(rhst, ((0, 0), (0, bp - b)))
            regv = jnp.pad(regv, ((0, 0), (0, bp - b)))
            if Gt2 is not None:
                Gt2 = jnp.pad(Gt2, ((0, 0), (0, 0), (0, bp - b)))
        x = _cholesky_solve_t(Gt.astype(jnp.float32),
                              rhst.astype(jnp.float32), regv,
                              interpret=_use_interpret(), panel=False,
                              Gt2=None if Gt2 is None
                              else Gt2.astype(jnp.float32))
        return x[:, :b]
    if Gt2 is not None:
        # upcast BEFORE the add: a bf16 sum re-rounds the combined gram
        # (the PSD rule) on exactly the correctness-anchor path (r4 review)
        Gt = Gt.astype(jnp.float32) + Gt2.astype(jnp.float32)
    G = jnp.transpose(Gt, (2, 0, 1)).astype(jnp.float32)
    if reg_vec is not None:
        G = G + (regv[0][:, None, None] * jnp.eye(k, dtype=G.dtype))
    x = solve_spd(G, jnp.transpose(rhst, (1, 0)), solver)
    return jnp.transpose(x, (1, 0))


def solve_spd_t_hot(Gt: jnp.ndarray, rhst: jnp.ndarray, hvT: jnp.ndarray,
                    vT: jnp.ndarray, alpha=None,
                    solver: str = "auto", reg_vec=None) -> jnp.ndarray:
    """solve_spd_t with a fused hot-column contribution.

    hvT (C, B) hot-column values for these systems' rows (0 = unobserved),
    vT (k, C) f32 hot factor rows, already rounded to the compute dtype. On
    the Pallas path the hot gram/rhs terms are computed INSIDE the solve
    kernel from an exact outer-product table built in VMEM (never
    materialized in HBM — every XLA-level formulation lost more to
    materialization + relayout than the hot block saved in gathers); the
    fallback computes them in XLA (CPU tests / correctness anchor) at
    HIGHEST matmul precision (a DEFAULT-precision TPU f32 dot is one bf16
    pass, which rounds the products and leaves G_hot indefinite).
    """
    from recommendation_models_tpu.ops.gram import objective_weights

    k, _, b = Gt.shape
    if b == 0:
        return jnp.zeros((k, 0), jnp.float32)
    solver = resolve_solver(solver)
    from recommendation_models_tpu.ops.pallas.cholesky import (
        block_batch as _bb, pallas_supported)
    # gate via pallas_supported (the literal k<=160 drifted from
    # block_batch's thresholds twice in round 3 — r4 review) AND require a
    # 128-multiple batch block: the hot kernel's manual DMA slices the
    # ANY-space G on block boundaries, which Mosaic requires 128-aligned —
    # at k>160 the narrowed block (e.g. 88) cannot tile the 128-padded
    # batch (reachable-config TPU compile failure; r4 review)
    if (solver == "pallas" and k % 8 == 0 and pallas_supported(k, b)
            and _bb(k) % 128 == 0):
        from recommendation_models_tpu.ops.pallas.cholesky import (
            _cholesky_solve_t_hot, _use_interpret, block_batch, hot_cols_cap)
        if hvT.shape[0] <= hot_cols_cap(k):
            block = block_batch(k)
            bp = b if b <= block else -(-b // block) * block
            # the fused kernel DMAs (k, k, bt) slices out of an ANY-space
            # G ref; Mosaic requires the sliced minor dim 128-aligned
            bp = -(-bp // 128) * 128
            if reg_vec is None:
                regv = jnp.zeros((1, b), jnp.float32)
            else:
                regv = jnp.asarray(reg_vec, jnp.float32).reshape(1, b)
            if bp != b:
                eye = jnp.eye(k, dtype=Gt.dtype)
                Gt = jnp.pad(Gt, ((0, 0), (0, 0), (0, bp - b)))
                Gt = Gt + eye[:, :, None] * (jnp.arange(bp) >= b
                                             )[None, None, :].astype(Gt.dtype)
                rhst = jnp.pad(rhst, ((0, 0), (0, bp - b)))
                regv = jnp.pad(regv, ((0, 0), (0, bp - b)))
                hvT = jnp.pad(hvT, ((0, 0), (0, bp - b)))
            x = _cholesky_solve_t_hot(Gt.astype(jnp.float32),
                                      rhst.astype(jnp.float32), regv, hvT,
                                      vT.astype(jnp.float32), alpha=alpha,
                                      interpret=_use_interpret())
            return x[:, :b]
        # hot block too wide for the kernel's VMEM budget: fall through
    hv_f = hvT.astype(jnp.float32)
    hm = (hv_f != 0).astype(jnp.float32)
    wg, wr = objective_weights(hv_f, hm, alpha)
    vt = vT.astype(jnp.float32)
    pT = (vt[:, None, :] * vt[None, :, :]).reshape(k * k, vt.shape[1])
    # HIGHEST: TPU f32 dots at DEFAULT run as one bf16 pass, rounding the
    # exact products and making G_hot indefinite (see the fused kernel)
    Gt = Gt + jnp.matmul(pT, wg,
                         preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST
                         ).reshape(k, k, b)
    rhst = rhst + jnp.matmul(vt, wr,
                             preferred_element_type=jnp.float32,
                             precision=jax.lax.Precision.HIGHEST)
    return solve_spd_t(Gt, rhst, solver, reg_vec=reg_vec)


def flat_ridge(G_flat: jnp.ndarray, k: int, reg, degrees=None) -> jnp.ndarray:
    """add_ridge on flat (B, k*k) systems."""
    eye_flat = jnp.eye(k, dtype=G_flat.dtype).reshape(-1)
    if degrees is None:
        return G_flat + reg * eye_flat
    scale = reg * jnp.maximum(degrees, 1.0)
    return G_flat + scale[:, None] * eye_flat


__all__ = ["solve_spd", "solve_spd_flat", "solve_spd_t", "solve_spd_t_hot",
           "add_ridge", "flat_ridge", "resolve_solver",
           "resolve_compute_dtype"]
