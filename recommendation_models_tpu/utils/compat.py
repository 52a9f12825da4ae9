"""Small JAX compat helpers."""

from __future__ import annotations

import jax


def match_vma(init, ref):
    """Give `init` the same varying-manual-axes as `ref`.

    Inside `shard_map`, `lax.scan` requires the carry's varying axes to match
    between input and output; constants (like a zeros init) start unvarying
    while data-derived outputs are varying. No-op outside shard_map.
    """
    vma = set()
    for leaf in jax.tree.leaves(ref):
        vma |= set(getattr(jax.typeof(leaf), "vma", ()) or ())
    if not vma:
        return init
    return jax.tree.map(
        lambda x: jax.lax.pcast(x, tuple(vma), to="varying"), init)


__all__ = ["match_vma"]
