"""Measure the per-row manual-DMA gather rate on TPU (VERDICT r4 ledger,
docs/PERF.md 'fused gather+gram kernel').

The k=64 ALS epoch is bound by XLA's row-gather index processing
(~175M rows/s, table-size/dtype/locality-invariant —
scripts/ablate_gather.py). The one untried kernel frontier was hand-DMA
row fetches inside Pallas (ANY-space table ref + make_async_copy per row)
feeding the gram in VMEM. Two mechanisms exist and this script measures
the viable one:

1. ``tpu.dynamic_gather`` (the only Mosaic gather primitive,
   jax/_src/pallas/mosaic/lowering.py:2489-2524) requires INDICES THE SAME
   SHAPE AS THE OPERAND — a row gather from the (62423, 64) ML-25M item
   table needs a (62423, 64) int32 index tensor: 16 MB of VMEM for the
   indices alone, on top of the 8 MB bf16 table, against the 16 MB scoped
   VMEM budget. Structurally impossible at our table sizes; no
   measurement needed (the lowering raises NotImplementedError for any
   other gather shape).

2. Per-row async DMA: issue one make_async_copy per gathered row
   (HBM table row -> VMEM scratch slot), S slots in flight. The bound is
   DMA ISSUE RATE, not bandwidth (a (1, 128) f32 row is 512 B). This
   script measures exactly that: rows/s for a deep-pipelined per-row copy
   loop, no compute, which upper-bounds any kernel built on it.

   Mosaic constraint (first measured run, 2026-08-21): a lane-dim slice
   must be tiling-aligned — ``memref_slice`` of (1, 64) from a
   (1,128)-tiled table is rejected ("Slice shape along dimension 1 must
   be aligned to tiling (128), but is 64"), so a k=64 row cannot even be
   DMA'd individually without padding the table to 128 lanes. The probe
   therefore copies full 128-lane rows (2x the k=64 payload); since the
   regime is issue-rate-bound, not bandwidth-bound, this only HELPS the
   manual-DMA side of the comparison if anything.

Run on the real chip:  python scripts/probe_dma_gather.py
"""

from __future__ import annotations

import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def make_probe(n_rows_table: int, k: int, n_gather: int, slots: int = 8,
               interpret: bool = False):
    """Kernel: gather ``n_gather`` rows by per-row DMA, ``slots`` in
    flight, reducing each landed row into an accumulator (so nothing is
    dead-code-eliminated). Returns fn(table, idx) -> (k,) f32 sum."""

    def kernel(idx_ref, table_ref, out_ref):
        def body(scratch, sems):
            def get_dma(slot, i):
                return pltpu.make_async_copy(
                    table_ref.at[pl.ds(idx_ref[i], 1), :],
                    scratch.at[pl.ds(slot, 1), :],
                    sems.at[slot],
                )

            # warm up: fill the pipeline
            for s in range(slots):
                get_dma(s, s).start()

            def loop(i, acc):
                slot = jax.lax.rem(i, slots)
                get_dma(slot, i).wait()
                acc = acc + scratch[pl.ds(slot, 1), :].astype(jnp.float32)

                @pl.when(i + slots < n_gather)
                def _():
                    get_dma(slot, i + slots).start()

                return acc

            acc = jax.lax.fori_loop(
                0, n_gather, loop, jnp.zeros((1, k), jnp.float32))
            out_ref[:] = acc

        pl.run_scoped(
            body,
            scratch=pltpu.VMEM((slots, k), jnp.float32),
            sems=pltpu.SemaphoreType.DMA((slots,)),
        )

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, k), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # idx: scalar reads
            pl.BlockSpec(memory_space=pl.ANY),       # table stays in HBM
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )


def main():
    n_table, k = 62_423, 128   # 128 lanes: Mosaic rejects 64-wide slices
    n_gather = 200_000
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.standard_normal((n_table, k)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, n_table, n_gather), jnp.int32)

    for slots in (4, 8, 16):
        fn = jax.jit(make_probe(n_table, k, n_gather, slots=slots))
        out = np.asarray(fn(idx, table))          # compile + warm
        t0 = time.perf_counter()
        out = np.asarray(fn(idx, table))          # dependent readback fence
        dt = time.perf_counter() - t0
        print(f"slots={slots:3d}: {n_gather / dt / 1e6:8.2f} M rows/s "
              f"({dt * 1e3:.1f} ms for {n_gather} rows)  checksum "
              f"{out.sum():.3f}")
    print("XLA gather reference (ablate_gather.py): ~175 M rows/s "
          "isolated; the kernel frontier must beat that to matter.")


if __name__ == "__main__":
    main()
