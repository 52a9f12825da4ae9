"""Isolated batched-solve probe: time the Pallas Cholesky kernel variants.

Times each variant as ONE device program (lax.scan of carry-dependent
repetitions + dependent readback — the only honest fence over the axon
tunnel, CLAUDE.md) and checks solutions against XLA's cho_solve on the
same device.  Used to evaluate the rank-128 'solve wall' frontier
(docs/PERF.md): the two-level Schur body vs the default rank-2 pair body.

Env: PSV_K (default 128), PSV_B (65536), PSV_ITERS (10),
PSV_VARIANTS (comma list of pair,schur,rank1,panel; default pair,schur),
PSV_BT (override the kernel batch block — e.g. 256 to halve the number of
grid blocks and amortize per-pass scalar overhead over more lanes).
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from recommendation_models_tpu.ops.pallas.cholesky import (
    _cholesky_solve_t, _use_interpret, block_batch)

VARIANT_KW = {
    "rank1": dict(panel=False, pair=False, subs2=False),   # the r1 baseline
    "pair": dict(panel=False, pair=True),
    "panel": dict(panel=True),
    "schur": dict(panel=False, schur=True),
    # subs2=False ablations (rank-1 substitutions)
    "pair_s1": dict(panel=False, pair=True, subs2=False),
    "schur_s1": dict(panel=False, schur=True, subs2=False),
    # dual-chain interleave (two bt/2 halves, fused loop bodies)
    "dual": dict(panel=False, dual=True),
}


def main() -> int:
    k = int(os.environ.get("PSV_K", "128"))
    b = int(os.environ.get("PSV_B", "65536"))
    n_iters = int(os.environ.get("PSV_ITERS", "10"))
    variants = os.environ.get("PSV_VARIANTS", "pair,schur").split(",")
    interpret = _use_interpret()
    bt_override = os.environ.get("PSV_BT")
    if bt_override:
        import recommendation_models_tpu.ops.pallas.cholesky as _ch
        kp = -(-k // 8) * 8
        _orig_bb = _ch.block_batch

        def _bb(kk, _o=_orig_bb, _kp=kp, _bt=int(bt_override)):
            return _bt if -(-kk // 8) * 8 == _kp else _o(kk)

        _ch.block_batch = _bb
        _ch._block_batch = _bb
    bt = block_batch(k) if not bt_override else int(bt_override)
    b = -(-b // bt) * bt
    print(f"# k={k} B={b} bt={bt} iters={n_iters} "
          f"interpret={interpret} device={jax.devices()[0].device_kind}")

    rng = np.random.default_rng(0)
    m = rng.standard_normal((b, k, k)).astype(np.float32) / np.sqrt(k)
    G = np.einsum("bij,bkj->bik", m, m) + 0.1 * np.eye(k, dtype=np.float32)
    rhs = rng.standard_normal((b, k)).astype(np.float32)
    Gt = jnp.asarray(np.transpose(G, (1, 2, 0)))
    rhst = jnp.asarray(rhs.T)
    regv = jnp.full((1, b), 0.05, jnp.float32)
    np.asarray(Gt[0, 0, 0]), np.asarray(rhst[0, 0])  # fence placement

    # XLA reference solution (same device, f32)
    import jax.scipy.linalg as jsl
    Gr = jnp.asarray(G) + 0.05 * jnp.eye(k, dtype=jnp.float32)
    nref = min(b, 4096)
    xref = jax.jit(lambda g, r: jsl.cho_solve(
        (jnp.linalg.cholesky(g), True), r))(Gr[:nref], jnp.asarray(rhs[:nref]))
    xref = np.asarray(xref)

    results, sols = {}, {}
    for v in variants:
        kw = VARIANT_KW[v]
        try:
            x = _cholesky_solve_t(Gt, rhst, regv, interpret=interpret, **kw)
            sols[v] = np.asarray(x)
            xs = sols[v][:, :nref].T
        except Exception as e:  # noqa: BLE001 — probe reports and moves on
            print(f"{v:8s} FAILED: {type(e).__name__}: {e}")
            continue
        denom = np.maximum(np.abs(xref), 1e-3)
        err = float(np.max(np.abs(xs - xref) / denom))
        if not interpret:
            def scanned(g, r, q):
                # carry perturbs the CHEAP rhs operand: a g + c add would
                # materialize a fresh (k, k, B) HBM array per iteration
                # (~10 ms at k=128/B=65k — measured, it inflated every
                # variant's time ~13%)
                def body(c, _):
                    out = _cholesky_solve_t(g, r + c, q,
                                            interpret=False, **kw)
                    return out.ravel()[0] * 1e-30, None
                c, _ = jax.lax.scan(body, jnp.float32(0), None,
                                    length=n_iters)
                return c
            jfn = jax.jit(scanned)
            np.asarray(jfn(Gt, rhst, regv))
            t0 = time.perf_counter()
            np.asarray(jfn(Gt, rhst, regv))
            dt = (time.perf_counter() - t0) / n_iters
            rate = b / dt / 1e6
            print(f"{v:8s} {dt * 1e3:9.2f} ms  {rate:7.2f} Msys/s  "
                  f"max_rel_err={err:.2e}")
            results[v] = dt
        else:
            print(f"{v:8s} (interpret, untimed)  max_rel_err={err:.2e}")
        if err > 5e-2:
            print(f"!! {v}: correctness FAILURE")
            return 1
    names = [v for v in variants if v in sols]
    for i in range(1, len(names)):
        a, c = names[0], names[i]
        same = np.array_equal(sols[a], sols[c])
        print(f"# bitwise {a} == {c}: {same}")
    if "pair" in results and "schur" in results:
        print(f"# schur/pair = {results['schur'] / results['pair']:.3f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
