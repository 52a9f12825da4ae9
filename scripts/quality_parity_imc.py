"""IMC dataset-scale quality parity vs the FULL reference-faithful CG
oracle (mirrors scripts/quality_parity.py for ALS; BASELINE.json:5).

ML-1M-shape synthetic bilinear problem (6040 x 3706, 64/48 side features,
~1M observations), 3 seeds, same init per seed: full OracleIMC fits vs the
TPU estimator — final objective, held-out RMSE, and inductive cold-start
RMSE on users excluded from training entirely.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from recommendation_models_tpu.data.synthetic import (synthetic_imc_ratings,
                                                      synthetic_side_features)
from recommendation_models_tpu.models.imc import IMC
from recommendation_models_tpu.oracle.imc_numpy import OracleIMC

N_USERS, N_ITEMS, D_U, D_I = 6_040, 3_706, 64, 48
RANK, REG, SWEEPS, CG = 16, 0.1, 6, 30


def main():
    import jax
    print(f"# device: {jax.devices()[0].device_kind}", file=sys.stderr)
    X, Y = synthetic_side_features(N_USERS, N_ITEMS, D_U, D_I, seed=0)
    users, items, ratings, _, _ = synthetic_imc_ratings(
        X, Y, 1_000_000, rank=RANK, noise=0.05, seed=0)
    cold = users >= int(0.9 * N_USERS)       # inductive holdout
    rng_split = np.random.default_rng(1)
    test = (~cold) & (rng_split.random(users.shape[0]) < 0.1)
    tr = (~cold) & (~test)

    out = {"objective": {"oracle": [], "tpu": []},
           "test_rmse": {"oracle": [], "tpu": []},
           "cold_rmse": {"oracle": [], "tpu": []}}
    t0 = time.time()
    for seed in (0, 1, 2):
        rng = np.random.default_rng(seed)
        W0 = (0.1 * rng.standard_normal((D_U, RANK))).astype(np.float32)
        H0 = (0.1 * rng.standard_normal((D_I, RANK))).astype(np.float32)
        o = OracleIMC(rank=RANK, reg=REG, n_sweeps=SWEEPS, cg_iters=CG)
        o.fit(users[tr], items[tr], ratings[tr], X, Y, W0=W0, H0=H0)
        m = IMC(rank=RANK, reg=REG, n_sweeps=SWEEPS, cg_iters=CG).fit(
            (users[tr], items[tr], ratings[tr]), X, Y, W0=W0, H0=H0)

        def rmse(model, mask, Xf=np.asarray(X, np.float64),
                 Yf=np.asarray(Y, np.float64)):
            if isinstance(model, OracleIMC):
                pred = model.predict(users[mask], items[mask], Xf, Yf)
            else:
                pred = model.predict(users[mask], items[mask])
            return float(np.sqrt(np.mean((ratings[mask] - pred) ** 2)))

        out["objective"]["oracle"].append(round(float(o.history_[-1]), 2))
        out["objective"]["tpu"].append(round(float(m.history_[-1]), 2))
        out["test_rmse"]["oracle"].append(round(rmse(o, test), 5))
        out["test_rmse"]["tpu"].append(round(rmse(m, test), 5))
        out["cold_rmse"]["oracle"].append(round(rmse(o, cold), 5))
        out["cold_rmse"]["tpu"].append(round(rmse(m, cold), 5))
        print(f"# seed {seed} done {time.time()-t0:.0f}s", file=sys.stderr)
    out["device"] = jax.devices()[0].device_kind
    print(json.dumps(out))


if __name__ == "__main__":
    main()
