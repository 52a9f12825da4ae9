"""Mesh and multi-host runtime init (SURVEY.md N6).

The reference has no device runtime at all (single Python process). Here the
distributed backend is the XLA collectives runtime over ICI/DCN: a 1-D
``jax.sharding.Mesh`` along the table-sharding axis, created from all
addressable-or-global devices, with ``jax.distributed.initialize`` for
multi-host pods (SURVEY.md §5 'Distributed communication backend').
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
from jax.sharding import Mesh

_DIST_INITIALIZED = False


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """Idempotent jax.distributed bootstrap for multi-host pod slices.

    On single-process runs this is a no-op; on TPU pods with cloud metadata
    all arguments auto-discover.
    """
    global _DIST_INITIALIZED
    if _DIST_INITIALIZED or jax.process_count() > 1:
        _DIST_INITIALIZED = True
        return
    if coordinator_address is None and num_processes is None:
        # Single-process (or auto-discovery not requested): nothing to do.
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    _DIST_INITIALIZED = True


def _resolve_devices(n_shards, platform):
    devices = jax.devices(platform) if platform else jax.devices()
    if n_shards is None:
        n_shards = len(devices)
    if n_shards > len(devices) and platform is None:
        # e.g. 1 real TPU attached but an 8-device virtual CPU mesh forced via
        # --xla_force_host_platform_device_count (tests / dry runs).
        try:
            cpu = jax.devices("cpu")
            if len(cpu) >= n_shards:
                devices = cpu
        except RuntimeError:
            pass
    if n_shards > len(devices):
        raise ValueError(
            f"requested {n_shards} shards but only {len(devices)} devices")
    return list(devices[:n_shards]), n_shards


def _slice_groups(devices):
    """Group devices by TPU slice (multislice pods expose ``slice_index``;
    elsewhere fall back to process_index, the DCN boundary on CPU/GPU)."""
    keys = []
    for d in devices:
        keys.append(getattr(d, "slice_index", None))
    if any(k is None for k in keys):
        keys = [d.process_index for d in devices]
    order = {}
    for d, k in zip(devices, keys):
        order.setdefault(k, []).append(d)
    return list(order.values())


def get_mesh(n_shards: Optional[int] = None,
             axis: str = "data",
             platform: Optional[str] = None,
             num_slices: Optional[int] = None) -> Mesh:
    """A 1-D mesh over ``n_shards`` devices along ``axis``.

    ``platform='cpu'`` selects the forced-host-device CPU mesh used by tests
    (SURVEY.md §4.2-2). Device order follows ``jax.devices()`` which is
    ICI-contiguous on TPU slices, so neighbor collectives ride ICI.

    ``num_slices`` (or auto-detected ``slice_index`` diversity) reorders
    devices SLICE-MAJOR: shards within a slice are contiguous, so ring
    collectives cross the slow DCN links only at the ``num_slices`` slice
    boundaries, and XLA's hierarchical collectives can phase intra-slice
    ICI against inter-slice DCN (SURVEY.md §2.2 N6 'hybrid ICI x DCN').
    """
    devices, n_shards = _resolve_devices(n_shards, platform)
    groups = _slice_groups(devices)
    if num_slices is not None and num_slices > 1 and len(groups) == 1:
        # virtual slicing for tests/dry-runs: contiguous equal blocks
        if n_shards % num_slices:
            raise ValueError(
                f"n_shards={n_shards} not divisible by num_slices={num_slices}")
        per = n_shards // num_slices
        groups = [devices[i * per:(i + 1) * per] for i in range(num_slices)]
    ordered = [d for g in groups for d in g]
    return Mesh(np.asarray(ordered), (axis,))


def get_hybrid_mesh(n_shards: Optional[int] = None,
                    num_slices: Optional[int] = None,
                    axes=("dcn", "data"),
                    platform: Optional[str] = None) -> Mesh:
    """A 2-D ``(num_slices, per_slice)`` mesh with the DCN boundary on the
    OUTER axis (SURVEY.md §2.2 N6).

    Programs that want explicit hierarchy — e.g. replicate factor tables
    across slices and shard within, psum-ing grams over ``axes[0]`` — shard
    over this mesh; big all-to-blocks then ride intra-slice ICI while only
    reductions cross DCN. On real multislice pods the grouping comes from
    ``device.slice_index`` (the same source ``mesh_utils.
    create_hybrid_device_mesh`` uses); on CPU test meshes pass
    ``num_slices`` for contiguous virtual slices.
    """
    devices, n_shards = _resolve_devices(n_shards, platform)
    groups = _slice_groups(devices)
    if len(groups) == 1:
        num_slices = num_slices or 1
        if n_shards % num_slices:
            raise ValueError(
                f"n_shards={n_shards} not divisible by num_slices={num_slices}")
        per = n_shards // num_slices
        groups = [devices[i * per:(i + 1) * per] for i in range(num_slices)]
    else:
        if num_slices is not None and num_slices != len(groups):
            raise ValueError(
                f"{len(groups)} real slices found but num_slices={num_slices}")
        sizes = {len(g) for g in groups}
        if len(sizes) != 1:
            raise ValueError(f"uneven slice sizes {sorted(sizes)}")
    flat = [d for g in groups for d in g]
    grid = np.asarray(flat).reshape(len(groups), -1)
    return Mesh(grid, tuple(axes))


def shard_put(mesh: Mesh, axis: str, x) -> jax.Array:
    """Place a host array row-sharded along ``axis`` via
    ``make_array_from_callback`` — each process places only its
    addressable shards, so the same code path serves one process or a
    multi-host pod slice (SURVEY.md N6). The ONE shared placement helper
    (r4 review: sharded_als and the IMC runner carried verbatim copies)."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    x = np.asarray(x)
    sharding = NamedSharding(mesh, P(axis, *([None] * (x.ndim - 1))))
    return jax.make_array_from_callback(x.shape, sharding,
                                        lambda idx: x[idx])


def replicate_put(mesh: Mesh, x) -> jax.Array:
    """Place a host array REPLICATED on every device of the mesh (same
    multi-process-safe callback placement as shard_put)."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    x = np.asarray(x)
    sharding = NamedSharding(mesh, P(*([None] * x.ndim)))
    return jax.make_array_from_callback(x.shape, sharding,
                                        lambda idx: x[idx])


def to_host(x) -> np.ndarray:
    """Fetch a (possibly multi-host sharded) jax.Array to host NumPy.

    Single-process arrays are fully addressable and copy directly; on a
    multi-host mesh the non-addressable shards are all-gathered across
    processes first (SURVEY.md §5 distributed backend: DCN only carries
    per-sweep scalars and final fetches)."""
    if getattr(x, "is_fully_addressable", True):
        return np.asarray(x)
    from jax.experimental import multihost_utils
    return np.asarray(multihost_utils.process_allgather(x, tiled=True))


__all__ = ["shard_put", "replicate_put",
           "get_mesh", "get_hybrid_mesh", "initialize_distributed",
           "to_host"]
