"""Checkpoint/resume via orbax (SURVEY.md §5).

The reference has no checkpointing (at most pickling the estimator). Here
sharded factor tables + sweep counter + history save each N sweeps through
orbax-checkpoint; restore yields host arrays that re-place onto a possibly
different mesh shape (recovery = restart-from-checkpoint, which is cheap at
half-sweep granularity for ALS).
"""

from __future__ import annotations

import os
import re
from typing import Any, Dict, Tuple

import jax
import numpy as np


def _ckpt_path(directory: str, step: int) -> str:
    return os.path.join(os.path.abspath(directory), f"step_{step:08d}")


def save_checkpoint(directory: str, step: int, state: Dict[str, Any],
                    metadata: Dict[str, Any] | None = None) -> str:
    """Save an array pytree via orbax; non-array `metadata` (hyperparams,
    config) goes to a JSON sidecar since StandardCheckpointer is arrays-only."""
    import json
    import orbax.checkpoint as ocp

    path = _ckpt_path(directory, step)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()
    if metadata is not None:
        with open(path + ".meta.json", "w") as f:
            json.dump(metadata, f)
    return path


def load_checkpoint(directory: str, step: int) -> Dict[str, Any]:
    """Restore as host NumPy arrays regardless of the saving topology, so a
    checkpoint written on an N-chip mesh restores onto any mesh shape (orbax
    resharding happens at re-placement time)."""
    import json
    import orbax.checkpoint as ocp

    path = _ckpt_path(directory, step)
    ckptr = ocp.PyTreeCheckpointer()
    tree = ckptr.metadata(path).item_metadata.tree
    restore_args = jax.tree.map(
        lambda m: ocp.RestoreArgs(restore_type=np.ndarray), dict(tree),
        is_leaf=lambda x: hasattr(x, "shape"))
    state = ckptr.restore(path, restore_args=restore_args)
    if os.path.exists(path + ".meta.json"):
        with open(path + ".meta.json") as f:
            state["metadata"] = json.load(f)
    return state


def load_latest(directory: str) -> Tuple[int, Dict[str, Any]]:
    directory = os.path.abspath(directory)
    steps = []
    for name in os.listdir(directory):
        m = re.fullmatch(r"step_(\d+)", name)
        if m:
            steps.append(int(m.group(1)))
    if not steps:
        raise FileNotFoundError(f"no checkpoints under {directory}")
    step = max(steps)
    return step, load_checkpoint(directory, step)


__all__ = ["save_checkpoint", "load_checkpoint", "load_latest"]
