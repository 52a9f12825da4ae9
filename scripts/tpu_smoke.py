"""On-device differential smoke test: Pallas kernels vs the XLA anchor.

CI runs the kernels in interpret mode on CPU (tests/conftest.py); this
script exercises the COMPILED Mosaic kernels on a real TPU across the
objective/layout combination matrix and checks them against the stock-XLA
solve path running on the same device with the same layouts and inits
(solver is the only variable). Run manually / per round:

    python scripts/tpu_smoke.py

Exits non-zero on any mismatch. ~2-4 min warm (first Pallas compile after
the remote Mosaic service goes cold can add ~5 min, CLAUDE.md).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import scipy.sparse as sp


def main() -> int:
    import jax

    from recommendation_models_tpu.data.synthetic import synthetic_ratings
    from recommendation_models_tpu.models.als import ALS

    if jax.devices()[0].platform != "tpu":
        print("no TPU attached; this script is for real-device validation")
        return 1

    users, items, ratings = synthetic_ratings(1200, 900, 60_000, rank=8,
                                              seed=7)
    R = sp.csr_matrix((ratings, (users, items)), shape=(1200, 900))
    rng = np.random.default_rng(0)
    U0 = 0.05 * rng.standard_normal((1200, 16)).astype(np.float32)
    V0 = 0.05 * rng.standard_normal((900, 16)).astype(np.float32)

    failures = 0
    # (alpha, hot_cols, dense_min_degree, reg_by_degree)
    combos = [
        (None, 0, None, False),       # plain explicit, no special blocks
        (None, 64, 24, False),        # hot + dense blocks
        (None, 64, 24, True),         # + degree-scaled ridge
        (10.0, 0, None, False),       # implicit
        (10.0, 64, 24, True),         # implicit + hot + dense + reg-by-deg
    ]
    for alpha, hot, dmd, rbd in combos:
        kw = dict(rank=16, reg=0.3, alpha=alpha, seed=0,
                  hot_cols=hot, dense_min_degree=dmd, reg_by_degree=rbd,
                  compute_dtype="float32")
        tag = f"alpha={alpha} hot={hot} dmd={dmd} rbd={rbd}"
        # This is a BREAKAGE detector, not a precision certification (the
        # CPU parity suite holds the kernels to 1e-4-class in interpret
        # mode, and sharded-vs-single-device on this chip is bit-identical
        # pallas-vs-pallas). xla-vs-pallas factor deltas here are dominated
        # by conditioning amplification: the explicit U half agrees to
        # 5e-6 after one sweep, but the V half solved against U_new
        # amplifies that to ~4e-2, implicit systems (G0-dominated, large
        # kappa) to ~5e-3, and by sweep 3 factors wander ~0.3 along
        # near-flat directions while the OBJECTIVE stays equal to ~1e-3
        # relative. Thresholds below catch order-of-magnitude breakage.
        anchor = ALS(solver="xla", n_sweeps=1, **kw).fit(R, U0=U0, V0=V0)
        kernel = ALS(solver="pallas", n_sweeps=1, **kw).fit(R, U0=U0, V0=V0)
        du = float(np.abs(kernel.U_ - anchor.U_).max())
        dv = float(np.abs(kernel.V_ - anchor.V_).max())
        a4 = ALS(solver="xla", n_sweeps=4, **kw).fit(R, U0=U0, V0=V0)
        k4 = ALS(solver="pallas", n_sweeps=4, **kw).fit(R, U0=U0, V0=V0)
        dh = float(np.abs(np.subtract(k4.history_, a4.history_)).max()
                   / max(a4.history_[-1], 1e-9))
        ok = du < 2e-2 and dv < 2e-1 and dh < 5e-3 \
            and np.isfinite(k4.U_).all()
        print(f"{'OK ' if ok else 'FAIL'} {tag}: 1-sweep |dU|={du:.2e} "
              f"|dV|={dv:.2e}; 4-sweep rel|drmse|={dh:.2e}")
        failures += 0 if ok else 1

    # rank 128: exercises the k>64 kernel blocks (bt=256 as of round 3)
    # on the compiled Mosaic path — CI only runs them in interpret mode
    rng = np.random.default_rng(1)
    U0w = 0.05 * rng.standard_normal((1200, 128)).astype(np.float32)
    V0w = 0.05 * rng.standard_normal((900, 128)).astype(np.float32)
    kw = dict(rank=128, reg=0.3, seed=0, compute_dtype="float32")
    a = ALS(solver="xla", n_sweeps=1, **kw).fit(R, U0=U0w, V0=V0w)
    p = ALS(solver="pallas", n_sweeps=1, **kw).fit(R, U0=U0w, V0=V0w)
    du = float(np.abs(p.U_ - a.U_).max())
    dh = abs(p.history_[-1] - a.history_[-1]) / max(a.history_[-1], 1e-9)
    ok = du < 2e-2 and dh < 5e-3 and np.isfinite(p.U_).all()
    print(f"{'OK ' if ok else 'FAIL'} rank=128 (bt=256 blocks): "
          f"|dU|={du:.2e} rel|drmse|={dh:.2e}")
    failures += 0 if ok else 1

    # bf16 compute path: finite + quality in the same ballpark as f32
    f32 = ALS(solver="pallas", rank=16, reg=0.3, n_sweeps=3, seed=0,
              compute_dtype="float32").fit(R, U0=U0, V0=V0)
    bf16 = ALS(solver="pallas", rank=16, reg=0.3, n_sweeps=3, seed=0,
               compute_dtype="bfloat16").fit(R, U0=U0, V0=V0)
    drift = abs(bf16.history_[-1] - f32.history_[-1])
    ok = np.isfinite(bf16.U_).all() and drift < 0.02
    print(f"{'OK ' if ok else 'FAIL'} bf16 compute: rmse {bf16.history_[-1]:.4f} "
          f"vs f32 {f32.history_[-1]:.4f} (drift {drift:.4f})")
    failures += 0 if ok else 1

    print("TPU-SMOKE", "PASS" if failures == 0 else f"FAIL ({failures})")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
