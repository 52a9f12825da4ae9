"""Config dataclasses (SURVEY.md §5 'Config / flag system').

The user surface stays sklearn-style estimator kwargs (reference parity);
these frozen dataclasses are the layer beneath, consumed by the solver,
layout, and mesh code, and parsed from CLI by the bench/train entry points.
"""

from __future__ import annotations

import dataclasses
from typing import Optional


@dataclasses.dataclass(frozen=True)
class SolveConfig:
    """Controls the per-row normal-equation solve path."""

    rank: int = 10
    # L2 regularization strength (lambda). The reference's `lambda_`.
    reg: float = 0.1
    # Scale reg by row degree (the common "weighted-lambda" ALS variant).
    reg_by_degree: bool = False
    # Implicit-feedback confidence alpha (Hu-Koren-Volinsky). None => explicit.
    alpha: Optional[float] = None
    # Gather/gram chunk along the padded-degree axis; bounds VMEM/HBM use for
    # whale rows (SURVEY.md §5 "long-context" analog: chunked gram accumulation).
    chunk: int = 512
    # Row-block budget (MB) for one gathered (rows, P, k) block: big buckets
    # are scanned in row-blocks this size. Originally a 256 MB HBM-OOM cap;
    # now primarily a scan-PIPELINING lever whose optimum is RANK-dependent
    # (measured v5e, docs/PERF.md 'gather budget': small blocks win at
    # k<=64 — 2 MB at the 1.12-growth layout — but k>64 inverts and wants
    # NO row-block scan at all, memory permitting). 0 = auto, resolved per
    # consumer by solver.als_sweep.resolve_gather_budget (rank-, size- and
    # sse-aware).
    # NOTE: there is deliberately no resolved-budget property here — the
    # auto policy is rank- AND size-gated (the unsplit k>64 mode OOMs at
    # 100M-obs scale) and needs the actual bucket volume; every consumer
    # resolves through solver.als_sweep.resolve_gather_budget (ADVICE r3:
    # the old property skipped the nnz gate).
    gather_budget_mb: int = 0
    # 'auto' = pallas on TPU / xla elsewhere; 'xla' = jnp.linalg.cholesky +
    # triangular solves (correctness anchor); 'pallas' = fused Pallas kernel;
    # 'lu' = jnp.linalg.solve fallback for ill-conditioned tests.
    solver: str = "auto"
    # dtype for the gram/matmul compute path (factors and all accumulation
    # stay float32). 'auto' = bfloat16 on TPU (half the gather HBM bytes,
    # 2x MXU; quality within run-to-run variance), float32 elsewhere.
    compute_dtype: str = "auto"
    # How the scanned fits compute the per-sweep training SSE (explicit
    # objective; the implicit objective always takes the direct pass):
    # 'riding' = the identity sse = sum w r^2 - 2 x.rhs + x^T G x evaluated
    #   inside the item half's solves; 'separate' = a dedicated masked_sse
    #   gather pass after the sweep; 'auto' = measured per config class
    #   (sse_separate_for below). Whole-epoch A/B on the v5e (r5,
    #   docs/measurements/r5/): riding looks free but is NOT at the
    #   ML-25M-rank-64 class (0.2035 vs 0.1858 separate), while every
    #   other measured class prefers riding (ml1m r64 8.7 vs 9.9 ms;
    #   synth100m r64 0.910 vs 1.222; ml25m r128 0.485 vs 0.610;
    #   synth100m r128 2.06 vs 2.85).
    sse_mode: str = "auto"


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Device mesh layout (SURVEY.md §2.2 N4/N6)."""

    # Number of shards along the table-sharding ('data') axis. None = all
    # local devices (or 1 if running single-device).
    n_shards: Optional[int] = None
    # 'allgather': replicate the opposite factor table per half-sweep
    #   (ALX-style dense gramian path; right choice while a table fits HBM).
    # 'all_to_all': rotation-scheduled request/response embedding exchange
    #   across table shards (SURVEY.md N5; for tables too large to
    #   replicate).
    # 'hybrid': all_to_all for the tail + the Zipf-head columns replicated
    #   via one small all_gather (keeps the hot-column fast path; see
    #   parallel.exchange).
    exchange: str = "allgather"
    # 'hybrid' exchange: replicate this many Zipf-head columns (None = auto,
    # max(1024, 8 * hot_cols) — see models.als._fit_sharded).
    exchange_head: Optional[int] = None
    # Mesh axis name used for the table shards.
    axis: str = "data"
    # Multislice pods: slice-major device ordering so ring collectives cross
    # DCN only at the num_slices slice boundaries (parallel.mesh.get_mesh).
    num_slices: Optional[int] = None
    # '1d' (default): slice-major table sharding over all devices.
    # 'obs_parallel': the explicit 2-D (dcn x data) hierarchy — rows
    # sharded within a slice, observations split across slices, per-row
    # normal equations psum'd over DCN (parallel.hybrid_als; wins only in
    # the few-rows x huge-degree regime — parallel.scaling.choose_topology).
    topology: str = "1d"
    # Optional explicit platform ('cpu' to force the host mesh in tests).
    platform: Optional[str] = None


@dataclasses.dataclass(frozen=True)
class DataConfig:
    """Ratings ingest and padded-layout construction (SURVEY.md N1/N12)."""

    # Degree buckets between these bounds; rows pad up to their bucket.
    # Lower bound 8 matches the f32 sublane tile. Rows with more than
    # max_bucket observations stay WHOLE in wide max_bucket-aligned buckets
    # (their gram is chunk-scanned over the padded width), keeping row ids
    # unique across buckets so every bucket solves independently.
    min_bucket: int = 8
    max_bucket: int = 4096
    # Bucket sizes grow geometrically by this ratio (rounded to multiples of
    # 8). 2.0 = powers of two; smaller ratios trade more compiled bucket
    # shapes for less padding waste (1.25 cut ML-1M user-side waste from
    # 17% to 11% and ML-25M user-side from 19% to ~8%). None = rank-aware
    # auto via estimator entry points (bucket_growth_for_rank: the optimum
    # is 1.12 at k<=64 — ML-25M epoch 0.216 -> 0.205 s — but 1.25 at
    # k=128, where extra bucket shapes cost more than padding); plain
    # layout builders resolve None to 1.25.
    bucket_growth: Optional[float] = None
    # Whale rows (degree > max_bucket) are solved on the DENSE gramian path:
    # their ratings are stored as a dense (W, n_cols) matrix and the grams
    # come from ONE MXU matmul against an outer-product feature matrix — no
    # gathers, no small-batch buckets (the ALX-style dense trick; ~5x faster
    # than gathered whale buckets, measured at ML-25M). Rows are taken
    # densest-first until the value matrix reaches dense_budget_mb; any
    # overflow stays on the (correct, slower) wide-bucket path. NOTE: the
    # dense block derives its observation mask from value != 0 — explicit
    # zero ratings there are treated as unobserved.
    dense_whales: bool = True
    dense_budget_mb: int = 2048
    # Rows with MORE than this many observations go to the dense block
    # (budget permitting, densest first). None = AUTO: estimator entry
    # points resolve it per rank via `dense_min_degree_for_rank` (the
    # break-even was measured at rank 64 — 512 — and scales ~k^2: 2048 at
    # k=128); plain layout builders resolve None to 512. Whales-only (the
    # pre-round-1 behavior) is dense_min_degree = max_bucket; no dense
    # path at all is dense_whales=False. (r4 review: the old 512 default
    # was conflated with "unset" by from_configs.)
    dense_min_degree: Optional[int] = None
    # Dense hot-column block: up to this many of the most popular columns'
    # observations leave the gather buckets for per-bucket (B, C) f16 slabs
    # whose gram contribution is computed INSIDE the fused Pallas solve
    # kernel (the transpose of the whale trick — targets the Zipf HEAD;
    # ML-25M rank-64: 0.374 -> 0.342 s/epoch). 0 disables. Sharded fits
    # keep hot columns under 'allgather'/'hybrid' exchange; 'all_to_all'
    # requires 0 (its compact exchanged table cannot serve global ids). The raw-DataConfig default stays 0 because the
    # budget depends on rank; ALS's auto policy sets it to
    # ops.pallas.cholesky.hot_cols_auto(rank) (the VMEM cap, or 0 when the
    # cap is below break-even width). Every XLA-level formulation
    # of the hot add LOST time to layout taxes — only the in-kernel form
    # wins (see _cholesky_solve_kernel_hot).
    hot_cols: int = 0
    # A column qualifies as hot when its observation count reaches this.
    # None => auto max(n_rows // 64, 32): the break-even count where one
    # column's slab matmul cost (n_rows * k^2 * 2 / peak) equals the gather
    # cost of its observations (~5.7 ns each) at k=64 on v5e.
    hot_min_count: Optional[int] = None
    # Adaptive bucket merging (opt-in): lift a bucket into the next wider
    # pad while the extra padded slots per lift stay under this. ISOLATED
    # half-sweep probes measured wins (ML-25M item side 15 buckets -> 4,
    # 154 -> 127 ms) but the WHOLE jitted epoch regressed 0.254 -> 0.439 s
    # at slack=500k — yet another case of microbenches failing to predict
    # in-program behavior (see layout.py + CLAUDE.md). Default 0 = off;
    # kept as a knob for other dataset shapes.
    bucket_merge_slack: int = 0
    # Pad each bucket's row count to a multiple of this (sublane alignment).
    row_multiple: int = 8
    # Packed on-disk layout cache prefix (SURVEY.md §7 hard part 6: bucket
    # once, not per run). None = rebuild every fit.
    layout_cache: Optional[str] = None


def gather_budget_for_rank(rank: int, nnz: Optional[int] = None) -> int:
    """Rank-aware row-block gather budget (MB), SolveConfig auto policy.

    Small blocks pipeline (XLA overlaps a block's gathers with the previous
    block's solve) but multiply per-step scan overhead; the solve's FLOPs
    grow k^2 while gather bytes grow k, so at high rank the solve is long
    enough to hide gathers WITHOUT small blocks and the scan overhead
    dominates. Measured on v5e at ML-25M shapes (docs/PERF.md 'gather
    budget'): k=64 epoch 0.25 s @ 8 MB vs 0.34 @ 256; k=128 inverts and
    keeps improving as the scan disappears: 0.614 @ 8, 0.545 @ 256,
    0.532 @ 512, 0.507 @ 4096 (which leaves every ML-25M bucket unsplit —
    the row-block scan's per-step overhead is pure loss at high rank).
    24/64 MB sit between the regimes and are worse than either end
    (0.620/0.660). synth100m k=64 confirms 8 MB (0.92 vs 1.65 s).

    ``nnz`` gates the unsplit mode by problem size: at 100M-interaction
    scale the coexisting multi-GB gathered temps of unsplit buckets
    exceeded a v5e's HBM (measured: 17.4 G needed vs 15.75 G at synth100m
    rank-128), so k>64 problems beyond ~40M observations keep a bounded
    scan — at **1536 MB** blocks since round 5: the full on-chip ladder at
    synth100m rank-128 (docs/measurements/r5/tune100m/, whole-epoch) is
    3.06 s @ 256, 3.47 @ 512, 2.92 @ 1024, **2.06 @ 1536**, 2.08 @ 1792,
    2.13 @ 2048, and 3072/4096 fail to compile (HBM) — a −33% epoch over
    the old 256 MB point, with 512 a local MAXIMUM (mid-size blocks pay
    scan overhead without yet amortizing it; don't "split the
    difference"). Hot-column slabs (32/64/128 wide) and dense-whale
    thresholds 1024/4096 were re-swept at this scale and never beat plain
    1536 MB blocks (best hot combo 2.076). ``solver.als_sweep.
    resolve_gather_budget`` — the single resolution point every consumer
    goes through — passes its actual padded bucket volume; ``None``
    assumes the (measured) ML-25M class.

    Round 3 re-swept the k<=64 point at the 1.12-growth layout: 2 MB wins
    (ML-25M 0.2008 vs 0.2041 @ 8 / 0.213 @ 16; 1 MB 0.2011 is past the
    optimum; ML-1M 7.6 vs 8.5 ms; synth100m neutral at 0.912)."""
    if rank <= 64:
        return 2
    if nnz is not None and nnz > 40_000_000:
        return 1536
    return 4096


def sse_separate_for(cfg, nnz: Optional[int]) -> bool:
    """Resolve SolveConfig.sse_mode to 'use the separate masked_sse pass?'.

    Empirical per-config-class policy (see SolveConfig.sse_mode for the
    measured table): the separate pass wins ONLY at the ML-25M-rank-64
    class — k<=64 with 5M < nnz <= 40M. Everywhere else the riding
    identity is cheaper (at k>64 the identity's extra terms are small
    while a separate unsplit/8MB-floored pass re-gathers every slot; at
    100M-obs scale the separate pass's 8 MB-floor scan overhead over the
    much larger tables dominates; at ML-1M scale the fixed cost of the
    extra pass loses). The implicit objective has no riding identity and
    always takes the direct pass.
    """
    mode = getattr(cfg, "sse_mode", "auto")
    if mode not in ("auto", "riding", "separate"):
        raise ValueError(f"sse_mode must be auto|riding|separate, "
                         f"got {mode!r}")
    if cfg.alpha is not None:
        # the riding identity is an explicit-least-squares identity; the
        # implicit objective always takes the direct pass (mode ignored)
        return True
    if mode != "auto":
        return mode == "separate"
    return (cfg.rank <= 64 and nnz is not None
            and 5_000_000 < nnz <= 40_000_000)


def bucket_growth_for_rank(rank: int) -> float:
    """Rank-aware geometric bucket-growth ratio (DataConfig auto policy).

    Finer grids cut padding waste (fewer gathered slots — the lever that
    actually works on this workload) but add compiled bucket shapes and
    per-bucket dispatch. Measured on v5e at ML-25M shapes (10-sweep bench):
    k=64 epoch 0.2163 @ 1.25, 0.2072 @ 1.16, **0.205 @ 1.12** (stable x2),
    0.2072 @ 1.09, 0.2154 @ 1.06 — a clear interior optimum; k=128 inverts
    (0.505 @ 1.12 vs **0.484 @ 1.25**): the epoch is solve-bound there, so
    saved gather slots buy little while extra shapes still cost. Coarser
    grids lose badly at k=128 too (0.627 @ 1.4, 0.655 @ 1.6) — 1.25 is an
    interior optimum at both ranks, not an endpoint."""
    return 1.12 if rank <= 64 else 1.25


def dense_min_degree_for_rank(rank: int, max_bucket: int = 4096) -> int:
    """Rank-aware dense-whale threshold (ALS/bench auto policy).

    The dense-gramian path costs ~2*k^2*n_cols MXU FLOPs per row regardless
    of the row's degree, while the gathered path's cost is ~degree gather
    slots (index-processing-bound, k-independent) — so the break-even degree
    grows as k^2. Measured on v5e at ML-25M shapes: 512 optimal at k=64
    (item half 329 ms at thr=512 vs 346 at 1024), 2048 at k=128 (286 ms vs
    329 at 512). Clamped to >=512 — at low ranks going denser earlier is
    unmeasured and widens the dense block's value!=0 observation-mask caveat
    — and to max_bucket (wider rows must leave the bucket path anyway)."""
    return min(max(rank * rank // 8, 512), max_bucket)


@dataclasses.dataclass(frozen=True)
class FitConfig:
    """Sweep-loop hyperparameters (reference: max_iter / tol)."""

    n_sweeps: int = 10
    tol: float = 0.0  # 0 => always run n_sweeps (deterministic benches)
    seed: int = 0
    init_scale: float = 0.01
    checkpoint_dir: Optional[str] = None
    checkpoint_every: int = 0  # 0 => disabled


__all__ = ["SolveConfig", "MeshConfig", "DataConfig", "FitConfig",
           "dense_min_degree_for_rank", "gather_budget_for_rank",
           "bucket_growth_for_rank", "sse_separate_for"]
