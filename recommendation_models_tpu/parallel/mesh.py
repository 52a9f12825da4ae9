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


def get_mesh(n_shards: Optional[int] = None,
             axis: str = "data",
             platform: Optional[str] = None) -> Mesh:
    """A 1-D mesh over ``n_shards`` devices along ``axis``.

    ``platform='cpu'`` selects the forced-host-device CPU mesh used by tests
    (SURVEY.md §4.2-2). Device order follows ``jax.devices()`` which is
    ICI-contiguous on TPU slices, so neighbor collectives ride ICI.
    """
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
    return Mesh(np.asarray(devices[:n_shards]), (axis,))


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


__all__ = ["get_mesh", "initialize_distributed", "to_host"]
