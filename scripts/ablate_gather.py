"""Dissect the TPU gather rate that bounds the narrow-bucket gram path.

Measured (profile of the ML-25M item half): a materializing row gather from
a (162k, 64) bf16 table runs at ~70-90M rows/s, while the same gather fused
with a reduction hits ~600M rows/s. Hypotheses tested here:

  H1 output tiling: a (X, 64) output half-fills the 128-lane tiles ->
     2x write amplification. Pairing two gathered rows into 128-lane rows
     (take (B,P,64) -> reshape (B,P/2,128)) should recover rate.
  H2 address locality: iota (sequential) vs uniform-random indices.
  H3 dtype: bf16 vs f32 table.
  H4 MXU shape: the k=64 gram einsum half-fills the MXU; a 128-wide paired
     gram (2 obs per slot, keep the two diagonal 64x64 blocks) does the
     same useful work on full tiles.

Each timing is a lax.scan of ITERS carry-dependent reps fenced by one
dependent readback (CLAUDE.md: the only honest fence over the axon tunnel).
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

T = int(os.environ.get("GAB_TABLE", 162_541))
B = int(os.environ.get("GAB_B", 14_592))
P = int(os.environ.get("GAB_P", 56))
K = int(os.environ.get("GAB_K", 64))
ITERS = int(os.environ.get("GAB_ITERS", 10))


def timed(fn, x, *args, label=""):
    def scanned(x, *rest):
        def body(c, _):
            out = fn(x + c, *rest)
            leaf = jax.tree_util.tree_leaves(out)[0]
            return jnp.asarray(leaf, jnp.float32).ravel()[0] * 1e-30, None
        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=ITERS)
        return c

    jfn = jax.jit(scanned)
    np.asarray(jfn(x, *args))
    t0 = time.perf_counter()
    np.asarray(jfn(x, *args))
    dt = (time.perf_counter() - t0) / ITERS
    rows = B * P
    print(f"{label:52s} {dt * 1e3:8.2f} ms  {rows / dt / 1e6:8.1f} M rows/s")
    return dt


def main():
    rng = np.random.default_rng(0)
    Vf = jnp.asarray(rng.standard_normal((T, K)), jnp.float32)
    Vb = Vf.astype(jnp.bfloat16)
    idx = jnp.asarray(rng.integers(0, T, (B, P)), jnp.int32)
    idx_seq = jnp.asarray(
        (np.arange(B * P, dtype=np.int64) % T).reshape(B, P), jnp.int32)
    idx_sorted = jnp.asarray(np.sort(np.asarray(idx), axis=1), jnp.int32)
    wg = jnp.asarray(rng.uniform(0.5, 1, (B, P)), jnp.float32)

    print(f"# table ({T},{K}), idx ({B},{P}) = {B*P:,} rows, {ITERS} iters")

    # --- raw gather rates -------------------------------------------------
    timed(lambda v, i: jnp.take(v, i, axis=0), Vb, idx,
          label="take bf16 -> (B,P,64) materialized")
    timed(lambda v, i: jnp.take(v, i, axis=0), Vf, idx,
          label="take f32  -> (B,P,64) materialized")
    timed(lambda v, i: jnp.take(v, i, axis=0), Vb, idx_seq,
          label="take bf16, iota idx (locality ceiling)")
    timed(lambda v, i: jnp.take(v, i, axis=0), Vb, idx_sorted,
          label="take bf16, row-sorted idx")
    timed(lambda v, i: jnp.take(v, i, axis=0).sum((0, 1)), Vb, idx,
          label="take bf16 + fused sum (no materialization)")

    # --- H1: pair two gathered rows into 128-lane rows --------------------
    q = P // 2
    timed(lambda v, i: jnp.take(v, i, axis=0).reshape(B, q, 2 * K),
          Vb, idx[:, :2 * q],
          label="take bf16 -> reshape (B,P/2,128)")

    # --- H4: gram einsum shapes at equal useful work ----------------------
    def gram64(v, i, w):
        vg = jnp.take(v, i, axis=0)
        vw = vg * w[..., None].astype(vg.dtype)
        return jnp.einsum("bpk,bpl->klb", vw, vg,
                          preferred_element_type=jnp.float32)

    def gram128_pair(v, i, w):
        vg = jnp.take(v, i, axis=0).reshape(B, q, 2 * K)
        vw = vg * w[:, :2 * q].reshape(B, q, 2, 1).repeat(K, -1).reshape(
            B, q, 2 * K).astype(vg.dtype)
        g = jnp.einsum("bqx,bqy->xyb", vw, vg,
                       preferred_element_type=jnp.float32)
        return g[:K, :K] + g[K:, K:]

    timed(gram64, Vb, idx, wg, label="gram einsum k=64 (current)")
    timed(gram128_pair, Vb, idx, wg, label="gram einsum 128-pair (2 obs/slot)")


if __name__ == "__main__":
    main()
