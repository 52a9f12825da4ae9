"""Gram accumulation for the per-row normal equations (SURVEY.md N2/N3).

The reference computes, per row u with observed columns Ω and weights, the
gram matrix ``G_u = V_Ω^T diag(w) V_Ω`` and right-hand side ``b_u = V_Ω^T t``
in a Python loop (SURVEY.md §3.1). Here it is one batched einsum over a
padded bucket — MXU-shaped (B, P, k) contractions — with the P (degree) axis
*chunked* via lax.scan so whale rows never materialize a (B, P, k) gather
larger than (B, chunk, k) (SURVEY.md §5: the blockwise-attention analog for
gram matrices).

Weights are caller-supplied so one code path covers both objectives:
  explicit ALS:  wg = mask,             wr = mask * rating
  implicit  ALS: wg = alpha*rating*mask, wr = (1 + alpha*rating) * mask
(with the implicit global gramian V^T V added by the solver, SURVEY.md N7).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from recommendation_models_tpu.utils.compat import match_vma


def _chunk3(x: jnp.ndarray, chunk: int) -> jnp.ndarray:
    """(B, P) -> (n_chunks, B, chunk), zero-padding P up to a multiple."""
    b, p = x.shape
    n_chunks = -(-p // chunk)
    if p != n_chunks * chunk:
        x = jnp.pad(x, ((0, 0), (0, n_chunks * chunk - p)))
    return x.reshape(b, n_chunks, chunk).swapaxes(0, 1)


def gram_rhs(
    V: jnp.ndarray,          # (n_cols, k) opposite factor table (or exchanged block)
    indices: jnp.ndarray,    # (B, P) int32 column ids into V
    wg: jnp.ndarray,         # (B, P) gram weights (0 on padding)
    wr: jnp.ndarray,         # (B, P) rhs weights*targets (0 on padding)
    chunk: int = 512,
    compute_dtype: jnp.dtype = jnp.float32,
):
    """Returns ``G (B, k, k) = Σ_p wg_p v_p v_p^T`` and ``rhs (B, k) = Σ_p wr_p v_p``.

    Accumulation is always float32 (``preferred_element_type``); ``compute_dtype``
    only controls the MXU input precision (bf16 doubles matmul throughput).
    """
    b, p = indices.shape
    k = V.shape[-1]
    # Cast the table ONCE before the gather (not per gathered row): in bf16
    # this halves the gather's HBM traffic — the dominant cost of the sweep.
    V = V.astype(compute_dtype)

    def accumulate(idx_c, wg_c, wr_c, G, rhs):
        Vg = jnp.take(V, idx_c, axis=0)                        # (B, C, k)
        Vw = Vg * wg_c[..., None].astype(compute_dtype)
        G = G + jnp.einsum("bpk,bpl->bkl", Vw, Vg,
                           preferred_element_type=jnp.float32)
        rhs = rhs + jnp.einsum("bpk,bp->bk", Vg,
                               wr_c.astype(compute_dtype),
                               preferred_element_type=jnp.float32)
        return G, rhs

    if p <= chunk:
        G = jnp.zeros((b, k, k), jnp.float32)
        rhs = jnp.zeros((b, k), jnp.float32)
        return accumulate(indices, wg, wr, G, rhs)

    idx_ch = _chunk3(indices, chunk)
    wg_ch = _chunk3(wg, chunk)
    wr_ch = _chunk3(wr, chunk)

    def body(carry, xs):
        G, rhs = carry
        idx_c, wg_c, wr_c = xs
        return accumulate(idx_c, wg_c, wr_c, G, rhs), None

    init = match_vma(
        (jnp.zeros((b, k, k), jnp.float32), jnp.zeros((b, k), jnp.float32)),
        (V, indices, wg, wr))
    (G, rhs), _ = jax.lax.scan(body, init, (idx_ch, wg_ch, wr_ch))
    return G, rhs


def gram_rhs_t(
    V: jnp.ndarray,          # (n_cols, k) opposite factor table
    indices: jnp.ndarray,    # (B, P) int32 column ids into V
    wg: jnp.ndarray,         # (B, P) gram weights (0 on padding)
    wr: jnp.ndarray,         # (B, P) rhs weights*targets (0 on padding)
    chunk: int = 512,
    compute_dtype: jnp.dtype = jnp.float32,
    init=None,
):
    """Batch-MINOR gram: returns ``G (k, k, B)`` and ``rhs (k, B)`` — the
    exact layout the Pallas solve kernel consumes.

    Emitting ``klb`` straight from the einsum lets XLA fold the layout
    change into the matmul epilogue; materializing ``(B, k, k)`` and
    transposing afterwards costs a separate whole-array relayout pass
    (~35 ms per ML-25M half-sweep, measured) because the (…, k, k) result
    pads its minor dim to the 128-lane tile.

    ``init``: optional (G0 (k,k,B), rhs0 (k,B)) starting accumulators (the
    hot-column contribution). When given, the P axis is ALWAYS scan-chunked
    (at least 2 chunks): accumulating into the lax.scan carry pins the
    carry's klb layout, which forces the dot to emit klb directly and folds
    the G0 add into the loop — every XLA-level alternative (post-add, init
    of a single fused accumulate, a second custom-call operand) either
    re-introduced a (B,k,k)-major materialize+copy+transpose chain
    (~26 ms/big ML-25M bucket) or blew the kernel's scoped-vmem limit.
    """
    b, p = indices.shape
    k = V.shape[-1]
    V = V.astype(compute_dtype)

    def accumulate(idx_c, wg_c, wr_c, G, rhs):
        Vg = jnp.take(V, idx_c, axis=0)                        # (B, C, k)
        Vw = Vg * wg_c[..., None].astype(compute_dtype)
        G = G + jnp.einsum("bpk,bpl->klb", Vw, Vg,
                           preferred_element_type=jnp.float32)
        rhs = rhs + jnp.einsum("bpk,bp->kb", Vg,
                               wr_c.astype(compute_dtype),
                               preferred_element_type=jnp.float32)
        return G, rhs

    if init is not None and p > 8:
        # NOTE: forcing >= 2 chunks WITHOUT an init (to pin the carry's klb
        # layout and drop the dot's (B,k,k)-major copy, ~19 ms/user half)
        # measured 3x SLOWER overall — halved-width gathers lose far more
        # than the relayout costs. Scan-chunking stays init-only.
        half = -(-p // 2)
        chunk = min(chunk, -(-half // 8) * 8)  # >= 2 chunks, 8-aligned
    if p <= chunk:
        if init is None:
            G = jnp.zeros((k, k, b), jnp.float32)
            rhs = jnp.zeros((k, b), jnp.float32)
        else:
            G, rhs = init
        return accumulate(indices, wg, wr, G, rhs)

    idx_ch = _chunk3(indices, chunk)
    wg_ch = _chunk3(wg, chunk)
    wr_ch = _chunk3(wr, chunk)

    def body(carry, xs):
        G, rhs = carry
        idx_c, wg_c, wr_c = xs
        return accumulate(idx_c, wg_c, wr_c, G, rhs), None

    if init is None:
        init = (jnp.zeros((k, k, b), jnp.float32),
                jnp.zeros((k, b), jnp.float32))
    init = match_vma(init, (V, indices, wg, wr))
    (G, rhs), _ = jax.lax.scan(body, init, (idx_ch, wg_ch, wr_ch))
    return G, rhs


def objective_weights(values: jnp.ndarray, mask: jnp.ndarray, alpha):
    """(wg, wr) for `gram_rhs` given the objective.

    ``alpha is None`` => explicit least squares on ratings;
    otherwise Hu-Koren-Volinsky confidence weighting ``c = 1 + alpha*r`` on
    binarized preference p=1 (SURVEY.md §2.1 row 3, §3.1 implicit variant).
    """
    if alpha is None:
        return mask, mask * values
    conf_minus_1 = alpha * values * mask
    return conf_minus_1, (1.0 + alpha * values) * mask


__all__ = ["gram_rhs", "gram_rhs_t", "objective_weights"]
