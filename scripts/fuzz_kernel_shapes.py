"""On-device kernel shape fuzz: random (k, b) batched-solve shapes through
`ops.solve.solve_spd_t` COMPILED on the real TPU, differenced against the
XLA anchor on the same device.

The support surface (`pallas_supported` boundaries: sub-128-lane blocks,
two-operand halving, the k>160 formula branch, batch padding to block
multiples) is exactly where this round's latent bugs lived; CPU CI runs
these paths in interpret mode only, and Mosaic's real constraints differ.
Each new shape compiles in seconds once the remote service is warm.

    python scripts/fuzz_kernel_shapes.py [n_trials] [seed]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import jax
    import jax.numpy as jnp
    from recommendation_models_tpu.ops.pallas.cholesky import pallas_supported
    from recommendation_models_tpu.ops.solve import solve_spd_t

    if jax.devices()[0].platform != "tpu":
        print("no TPU attached; this fuzz targets compiled Mosaic")
        return 1
    n_trials = int(sys.argv[1]) if len(sys.argv) > 1 else 25
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    rng = np.random.default_rng(seed)
    t0 = time.time()
    for t in range(n_trials):
        k = int(rng.integers(1, 33)) * 8          # 8..256, sublane-aligned
        b = int(rng.integers(1, 600))
        two_op = bool(rng.random() < 0.3)
        reg = float(rng.uniform(0.05, 1.0))
        tag = (f"trial {t}: k={k} b={b} 2op={two_op} "
               f"supported={pallas_supported(k, b, two_operand=two_op)}")
        A = rng.standard_normal((b, k, k)).astype(np.float32) / np.sqrt(k)
        G = np.einsum("bij,bkj->bik", A, A) + 0.1 * np.eye(k, dtype=np.float32)
        rhs = rng.standard_normal((b, k)).astype(np.float32)
        Gt = jnp.asarray(G.transpose(1, 2, 0))
        rt = jnp.asarray(rhs.T)
        rv = jnp.full((b,), reg, jnp.float32)
        kw = {}
        if two_op:
            B2 = rng.standard_normal((b, k, k)).astype(np.float32) / np.sqrt(k)
            G2 = np.einsum("bij,bkj->bik", B2, B2)
            kw["Gt2"] = jnp.asarray(G2.transpose(1, 2, 0))
            G = G + G2
        x = np.asarray(solve_spd_t(Gt, rt, "pallas", reg_vec=rv, **kw)).T
        ref = np.asarray(solve_spd_t(Gt, rt, "xla", reg_vec=rv, **kw)).T
        scale = max(np.abs(ref).max(), 1.0)
        err = np.abs(x - ref).max() / scale
        assert np.isfinite(x).all(), tag
        assert err < 5e-3, f"diverged ({err:.2e})\n{tag}"
        print(f"ok {tag} err={err:.1e} [{time.time() - t0:.0f}s]",
              flush=True)
    print(f"KERNEL SHAPE FUZZ PASS: {n_trials} trials, {time.time()-t0:.0f}s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
