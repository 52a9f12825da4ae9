"""Probe: does splitting an over-scoped-VMEM factor table into <=16MB halves
(masked double gather inside a row-block scan) beat one HBM gather?

Context (scripts/profile_half.py, ML-25M rank-64): user-half gathers read the
8MB item table at ~540M rows/s (XLA stages scan-invariant operands under the
16MB scoped-VMEM cap -> S(1)); item-half gathers read the 20.8MB user table
at ~36-92M rows/s from HBM. If two 10.4MB halves both stage, a masked
two-pass gram (2x gather slots at ~6x rate) should win ~3x on the gather
component.

Timing per CLAUDE.md: scanned device loop + dependent readback.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

N = 162_541            # user-table rows (ML-25M)
K = 64
B = 14_592             # rows per block (a real item-half bucket shape)
P = 56
NBLK = 6               # row-blocks in the scan
REPS = 20


def timed(fn, *args):
    out = fn(*args)
    np.asarray(out).ravel()[:1]
    t0 = time.perf_counter()
    out = fn(*args)
    np.asarray(out).ravel()[:1]
    return (time.perf_counter() - t0) / REPS


def main():
    rng = np.random.default_rng(0)
    V = jnp.asarray(rng.standard_normal((N, K)), jnp.float32)
    Vb = V.astype(jnp.bfloat16)
    idx = jnp.asarray(rng.integers(0, N, size=(NBLK, B, P)), jnp.int32)
    w = jnp.asarray(rng.random((NBLK, B, P)), jnp.float32)
    half = (N // 2) // 8 * 8

    def gram_from(tbl, idx_b, w_b):
        g = jnp.take(tbl, idx_b, axis=0)                      # (B, P, K) bf16
        gw = g.astype(jnp.float32) * w_b[..., None]
        return jnp.einsum("bpk,bpl->klb", gw.astype(jnp.bfloat16), g,
                          preferred_element_type=jnp.float32)

    # the rep carry must perturb an INPUT (w), not the accumulator —
    # otherwise the whole inner scan is loop-invariant and XLA hoists it
    # (measured: 20x-too-fast numbers with an accumulator-only carry)
    @jax.jit
    def baseline(Vb, idx, w):
        def rep(c, _):
            def blk(acc, xs):
                i_b, w_b = xs
                return acc + gram_from(Vb, i_b, w_b + c * 1e-30).sum(), None
            acc, _ = jax.lax.scan(blk, jnp.float32(0), (idx, w))
            return acc * 1e-30, None
        c, _ = jax.lax.scan(rep, jnp.float32(0), None, length=REPS)
        return c

    @jax.jit
    def split(V1, V2, idx, w):
        def rep(c, _):
            def blk(acc, xs):
                i_b, w_b = xs
                w_b = w_b + c * 1e-30
                m1 = i_b < half
                g1 = gram_from(V1, jnp.where(m1, i_b, 0), w_b * m1)
                g2 = gram_from(V2, jnp.where(m1, 0, i_b - half), w_b * ~m1)
                return acc + (g1 + g2).sum(), None
            acc, _ = jax.lax.scan(blk, jnp.float32(0), (idx, w))
            return acc * 1e-30, None
        c, _ = jax.lax.scan(rep, jnp.float32(0), None, length=REPS)
        return c

    rows = NBLK * B * P
    t = timed(baseline, Vb, idx, w)
    print(f"baseline  1x{N} table : {t*1e3:7.3f} ms/pass  "
          f"{rows/t/1e6:7.1f}M rows/s")
    V1, V2 = Vb[:half], Vb[half:]
    t = timed(split, V1, V2, idx, w)
    print(f"split     2x{half} tables: {t*1e3:7.3f} ms/pass  "
          f"{rows/t/1e6:7.1f}M rows/s (2x slots gathered)")

    # small-table reference: same slot count from an 8MB table
    Vs = Vb[:62_423]
    idx_s = idx % 62_423
    t = timed(baseline, Vs, idx_s, w)
    print(f"reference 1x62423 table: {t*1e3:7.3f} ms/pass  "
          f"{rows/t/1e6:7.1f}M rows/s")


if __name__ == "__main__":
    main()
