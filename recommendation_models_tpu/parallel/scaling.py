"""Analytic multi-host scaling model (SURVEY.md §2.2 N6, BASELINE.json
'scaling efficiency >= 0.8 at 2+ hosts').

Pod hardware is not attachable in this environment, so the >= 0.8 claim is
grounded the only defensible way: measured single-chip compute time +
EXACT per-shard collective bytes (parallel.exchange /
ShardedALSProgram.collective_bytes_per_sweep) + public link bandwidths,
combined with the standard hierarchical-collective cost model (the
"How to Scale Your Model" roofline recipe):

  t_sweep(S) = t_compute_1chip / S                       [perfect row split]
             + max(intra_bytes / bw_ici, inter_bytes / bw_dcn)

For ring/hierarchical collectives every byte crosses every link once per
phase, so the per-shard byte counts ARE the per-link volumes; intra-slice
phases ride ICI, the inter-slice phase (1/num_slices of the reduction or
the boundary crossings of a slice-major ring) rides DCN.

Defaults are order-of-magnitude public figures for v5e (ICI ~1600 Gbit/s/
chip => ~200 GB/s, DCN ~25 GB/s per host); override per deployment.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, List, Optional


@dataclasses.dataclass(frozen=True)
class LinkSpec:
    ici_bytes_per_s: float = 200e9    # per chip, all ICI links combined
    dcn_bytes_per_s: float = 25e9     # per host NIC
    chips_per_host: int = 4           # v5e host = 4 chips


def sweep_time_model(
    compute_s_1chip: float,
    bytes_per_shard: int,
    n_shards: int,
    num_slices: int = 1,
    links: LinkSpec = LinkSpec(),
) -> Dict[str, float]:
    """Predicted per-sweep time and scaling efficiency at ``n_shards``.

    ``bytes_per_shard`` is the per-shard per-sweep collective volume at this
    shard count (ShardedALSProgram.collective_bytes_per_sweep()
    ['per_sweep_total']). With a slice-major mesh (parallel.mesh.get_mesh
    num_slices ordering) the inter-slice share of a hierarchical collective
    is ``(num_slices - 1) / num_slices`` of one phase over the slice
    BOUNDARY — i.e. each boundary carries the full payload once — spread
    over the hosts of a slice.
    """
    compute = compute_s_1chip / n_shards
    if n_shards == 1:
        return dict(n_shards=1, compute_s=compute, comm_s=0.0,
                    sweep_s=compute, efficiency=1.0)
    intra = bytes_per_shard / links.ici_bytes_per_s
    inter = 0.0
    if num_slices > 1:
        chips_per_slice = n_shards // num_slices
        hosts_per_slice = max(1, chips_per_slice // links.chips_per_host)
        # hierarchical phase 2: the slice-reduced payload crosses DCN once
        # per boundary, striped over the slice's NICs
        inter = (bytes_per_shard * (num_slices - 1) / num_slices
                 / (links.dcn_bytes_per_s * hosts_per_slice))
    comm = max(intra, inter)
    sweep = compute + comm
    eff = (compute_s_1chip / n_shards) / sweep
    return dict(n_shards=n_shards, compute_s=compute, comm_s=comm,
                sweep_s=sweep, efficiency=eff)


def project_scaling(
    compute_s_1chip: float,
    bytes_fn: Callable[[int], int],
    shard_counts: List[int],
    slices_fn: Optional[Callable[[int], int]] = None,
    links: LinkSpec = LinkSpec(),
) -> List[Dict[str, float]]:
    """Efficiency table over shard counts; ``bytes_fn(S)`` supplies the
    per-shard bytes at each S (build an ExchangePlan per S or use the
    allgather identity), ``slices_fn(S)`` the slice count (default: one
    8-chip slice per 8 shards, v5e-pod-like)."""
    if slices_fn is None:
        slices_fn = lambda s: max(1, s // 8)
    return [sweep_time_model(compute_s_1chip, bytes_fn(s), s,
                             num_slices=slices_fn(s), links=links)
            for s in shard_counts]


def choose_topology(
    n_rows: int,
    n_cols: int,
    rank: int,
    n_shards: int,
    num_slices: int,
    links: LinkSpec = LinkSpec(),
) -> Dict[str, float]:
    """Per-device DCN bytes per half-sweep of the two multislice ALS
    topologies, and which one to pick (SURVEY.md N6):

    * '1d' — slice-major 1-D mesh (parallel.mesh.get_mesh): rows split over
      ALL devices, opposite table hierarchically all-gathered; each slice's
      devices share (D-1)/D of the table over the slice's NICs.
    * '2d' — observation-parallel hybrid mesh (parallel.hybrid_als): rows
      split WITHIN a slice, observations split across slices, per-row
      normal equations psum'd over DCN.

    The 2-D form wins only when per-row gram bytes (rows_local * k^2)
    undercut the table share — i.e. few rows x huge degrees (the
    long-context analog). On MovieLens shapes 1-D wins by ~2 orders of
    magnitude (tests/test_mesh_hybrid.py pins both regimes).
    """
    D, S = num_slices, n_shards
    if D <= 1:
        return dict(dcn_1d=0.0, dcn_2d=0.0, pick="1d")
    k = rank
    per_slice = max(1, S // D)
    # 1-D: the opposite table's slice share, striped over the slice devices
    dcn_1d = (D - 1) / D * n_cols * k * 4 / per_slice
    # 2-D: ring psum of this device's row-shard normal equations
    rows_local = -(-n_rows // per_slice)
    dcn_2d = 2 * (D - 1) / D * rows_local * (k * k + k) * 4
    return dict(dcn_1d=dcn_1d, dcn_2d=dcn_2d,
                pick="2d" if dcn_2d < dcn_1d else "1d")


__all__ = ["LinkSpec", "sweep_time_model", "project_scaling",
           "choose_topology"]
