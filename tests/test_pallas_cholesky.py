"""Pallas batched Cholesky solve kernel tests (SURVEY.md §4.2-3).

Runs in interpret mode on the CPU CI mesh (conftest pins default_device=cpu);
the identical kernel code compiles via Mosaic on a real TPU.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from recommendation_models_tpu.ops.pallas.cholesky import cholesky_solve
from recommendation_models_tpu.ops.solve import resolve_solver, solve_spd


def _random_spd(rng, b, k, jitter=0.5):
    A = rng.standard_normal((b, k, k)).astype(np.float32)
    return A @ A.transpose(0, 2, 1) + jitter * np.eye(k, dtype=np.float32)


@pytest.mark.parametrize("b,k", [(7, 10), (64, 64), (130, 24), (16, 128),
                                 (9, 8), (1, 40)])
def test_matches_dense_solve(rng, b, k):
    G = _random_spd(rng, b, k)
    rhs = rng.standard_normal((b, k)).astype(np.float32)
    x = np.asarray(cholesky_solve(jnp.asarray(G), jnp.asarray(rhs)))
    ref = np.stack([np.linalg.solve(G[i], rhs[i]) for i in range(b)])
    scale = max(np.abs(ref).max(), 1.0)
    np.testing.assert_allclose(x, ref, atol=5e-4 * scale, rtol=5e-4)


def test_matches_xla_path(rng):
    G = jnp.asarray(_random_spd(rng, 32, 16))
    rhs = jnp.asarray(rng.standard_normal((32, 16)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(solve_spd(G, rhs, "pallas")),
        np.asarray(solve_spd(G, rhs, "xla")),
        atol=1e-4, rtol=1e-4)


def test_ill_conditioned_with_ridge(rng):
    """lambda-jitter keeps badly scaled grams solvable (SURVEY.md §7 hard
    part 3)."""
    b, k = 16, 32
    A = rng.standard_normal((b, k, k)).astype(np.float32)
    G = A @ A.transpose(0, 2, 1)
    G[0] *= 1e-5                       # nearly singular after downscaling
    G = G + 1e-3 * np.eye(k, dtype=np.float32)
    rhs = rng.standard_normal((b, k)).astype(np.float32)
    x = np.asarray(cholesky_solve(jnp.asarray(G), jnp.asarray(rhs)))
    ref = np.stack([np.linalg.solve(G[i], rhs[i]) for i in range(b)])
    assert np.isfinite(x).all()
    resid = np.einsum("bij,bj->bi", G, x) - rhs
    assert np.abs(resid).max() < 1e-2 * max(np.abs(rhs).max(), 1.0)


def test_zero_system_padding_guard():
    """All-zero G rows (empty padded rows with reg=0) solve to finite zeros,
    not NaN — mirrors the sweep's 'padding contributes exactly zero' rule."""
    G = jnp.zeros((4, 8, 8), jnp.float32)
    rhs = jnp.zeros((4, 8), jnp.float32)
    x = np.asarray(cholesky_solve(G, rhs))
    assert np.isfinite(x).all()
    np.testing.assert_array_equal(x, 0.0)


def test_auto_resolves_off_tpu():
    # conftest pins default_device=cpu, so auto must pick the XLA anchor.
    assert resolve_solver("auto") == "xla"
    assert resolve_solver("pallas") == "pallas"


def test_panel_variant_matches(rng):
    """The rank-8 panel factorization must agree with the rank-1 kernel."""
    G = jnp.asarray(_random_spd(rng, 24, 40))
    rhs = jnp.asarray(rng.standard_normal((24, 40)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(cholesky_solve(G, rhs, panel=True)),
        np.asarray(cholesky_solve(G, rhs, panel=False)),
        rtol=2e-4, atol=2e-4)


def test_two_gram_operands_match_summed(rng):
    """The 2-operand kernel (hot-column gram summed in VMEM on load) must
    equal solving the pre-summed system."""
    from recommendation_models_tpu.ops.solve import solve_spd_t

    b, k = 48, 16
    G1 = _random_spd(rng, b, k)
    G2 = _random_spd(rng, b, k, jitter=0.1)
    rhs = rng.standard_normal((b, k)).astype(np.float32)
    reg = rng.uniform(0.05, 0.2, b).astype(np.float32)
    G1t = jnp.asarray(np.transpose(G1, (1, 2, 0)))
    G2t = jnp.asarray(np.transpose(G2, (1, 2, 0)))
    rt = jnp.asarray(rhs.T)
    x2 = np.asarray(solve_spd_t(G1t, rt, "pallas", reg_vec=reg, Gt2=G2t))
    xs = np.asarray(solve_spd_t(G1t + G2t, rt, "pallas", reg_vec=reg))
    np.testing.assert_allclose(x2, xs, rtol=2e-5, atol=2e-5)
    # and against the XLA anchor
    xa = np.asarray(solve_spd_t(G1t, rt, "xla", reg_vec=reg, Gt2=G2t))
    np.testing.assert_allclose(x2, xa, rtol=2e-4, atol=2e-4)


def test_hot_solve_matches_and_caps(rng):
    """solve_spd_t_hot == manually-folded hot system; a hot block wider
    than the kernel's VMEM cap falls back to the XLA formulation."""
    import jax
    from recommendation_models_tpu.ops.gram import objective_weights
    from recommendation_models_tpu.ops.pallas.cholesky import hot_cols_cap
    from recommendation_models_tpu.ops.solve import solve_spd_t, solve_spd_t_hot

    b, k = 40, 16
    for C in (24, hot_cols_cap(k) + 8):   # in-kernel path / cap fallback
        G = _random_spd(rng, b, k)
        rhs = rng.standard_normal((b, k)).astype(np.float32)
        reg = rng.uniform(0.05, 0.2, b).astype(np.float32)
        hv = np.where(rng.random((C, b)) < 0.4,
                      rng.integers(1, 11, (C, b)) * 0.5, 0.0
                      ).astype(np.float32)
        vh = (rng.standard_normal((C, k)) * 0.3).astype(np.float32)
        Gt = jnp.asarray(np.transpose(G, (1, 2, 0)))
        rt = jnp.asarray(rhs.T)
        x = np.asarray(solve_spd_t_hot(
            Gt, rt, jnp.asarray(hv), jnp.asarray(vh.T), alpha=None,
            solver="pallas", reg_vec=reg))
        # manual fold in f64
        wg, wr = objective_weights(hv, (hv != 0).astype(np.float32), None)
        Gh = np.einsum("cb,ck,cl->bkl", np.asarray(wg), vh, vh)
        rh = np.einsum("cb,ck->bk", np.asarray(wr), vh)
        ref = np.stack([
            np.linalg.solve(G[i] + Gh[i] + reg[i] * np.eye(k),
                            rhs[i] + rh[i]) for i in range(b)])
        np.testing.assert_allclose(x.T, ref, rtol=5e-4, atol=5e-4)


@pytest.mark.parametrize("variant", [
    dict(panel=False, pair=False, subs2=False),  # pure rank-1 baseline
    dict(panel=False, pair=False),               # rank-1 factor, pair subs
    dict(panel=False, pair=True, subs2=False),   # pair factor, rank-1 subs
    dict(panel=False, schur=True),               # two-level Schur
    dict(panel=False, dual=True),                # dual-chain interleave
])
def test_factor_variants_match(rng, variant):
    """Every factorization/substitution variant must solve the same systems
    (non-default variants are perf experiments — see scripts/
    probe_solve_variants.py and docs/PERF.md for the measured verdicts)."""
    from recommendation_models_tpu.ops.pallas.cholesky import (
        _cholesky_solve_t, _use_interpret, block_batch)

    k = 16
    b = block_batch(k)  # dual needs b % bt == 0
    G = _random_spd(rng, b, k)
    rhs = rng.standard_normal((b, k)).astype(np.float32)
    Gt = jnp.asarray(G.transpose(1, 2, 0))
    rhst = jnp.asarray(rhs.T)
    regv = jnp.full((1, b), 0.1, jnp.float32)
    x = np.asarray(_cholesky_solve_t(Gt, rhst, regv,
                                     interpret=_use_interpret(),
                                     **variant)).T
    Gr = G + 0.1 * np.eye(k, dtype=np.float32)
    ref = np.stack([np.linalg.solve(Gr[i], rhs[i]) for i in range(b)])
    scale = max(np.abs(ref).max(), 1.0)
    np.testing.assert_allclose(x, ref, atol=5e-4 * scale, rtol=5e-4)


@pytest.mark.parametrize("k", [192, 256])
def test_large_rank_blocks(rng, k):
    """k > 128 shrinks the lane block so VMEM stays bounded (robustness
    path, not a tuned one) — solutions must still match."""
    from recommendation_models_tpu.ops.pallas.cholesky import block_batch
    assert block_batch(k) * 3 * k * k * 4 <= 41 * 1024 * 1024
    b = 5
    G = _random_spd(rng, b, k, jitter=1.0)
    rhs = rng.standard_normal((b, k)).astype(np.float32)
    x = np.asarray(cholesky_solve(jnp.asarray(G), jnp.asarray(rhs)))
    ref = np.stack([np.linalg.solve(G[i], rhs[i]) for i in range(b)])
    scale = max(np.abs(ref).max(), 1.0)
    np.testing.assert_allclose(x, ref, atol=5e-4 * scale, rtol=5e-4)
