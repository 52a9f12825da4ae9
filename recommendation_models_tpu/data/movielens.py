"""MovieLens dataset parsers (SURVEY.md N12; BASELINE.json configs 1-3).

Handles the three on-disk formats:

- ML-100K  ``u.data``            tab-separated  ``user\titem\trating\tts``
- ML-1M    ``ratings.dat``       ``user::item::rating::ts``
- ML-25M   ``ratings.csv``       CSV with header ``userId,movieId,rating,timestamp``

IDs are remapped to dense 0-based ranges (MovieLens ids are 1-based and, for
25M, sparse in movieId space). A packed ``.npz`` cache is written next to the
source file so big files parse once (SURVEY.md §7 hard part 6).

If a fast native parser is available (``data/native``), it is used for the
text decode; NumPy fallback otherwise.
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Tuple

import numpy as np

Triplets = Tuple[np.ndarray, np.ndarray, np.ndarray]


def _dense_remap(ids: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    uniq, inv = np.unique(ids, return_inverse=True)
    return inv.astype(np.int32), uniq


def _load_delimited(path: str, delim: Optional[str], skip_header: bool) -> np.ndarray:
    """Parse a ratings text file to an (n, 3) float64 array [user, item, rating]."""
    from recommendation_models_tpu.data import native
    arr = native.parse_ratings(path, delim, skip_header)
    if arr is not None:
        return arr
    # NumPy fallback. '::' needs a two-step split since loadtxt wants 1-char
    # delimiters.
    if delim == "::":
        with open(path, "rb") as f:
            raw = f.read().replace(b"::", b"\t")
        from io import BytesIO
        return np.loadtxt(BytesIO(raw), delimiter="\t", usecols=(0, 1, 2),
                          ndmin=2)
    return np.loadtxt(path, delimiter=delim, usecols=(0, 1, 2),
                      skiprows=1 if skip_header else 0, ndmin=2)


def load_ratings_file(
    path: str,
    fmt: Optional[str] = None,
    cache: bool = True,
) -> Dict[str, np.ndarray]:
    """Load a MovieLens ratings file of any vintage.

    Returns dict with ``users`` (int32, dense), ``items`` (int32, dense),
    ``ratings`` (float32), ``n_users``, ``n_items``, plus the original-id
    vocabularies ``user_vocab`` / ``item_vocab``.

    Robustness (probed): with the NATIVE parser, malformed/short/binary
    lines are skipped and CRLF / missing trailing newlines handled; the
    NumPy fallback (no C toolchain) is strict and raises on malformed
    lines. Ids flow through float64/uint64 — exact to 2^53, silently
    ROUNDED (not wrapped) beyond (MovieLens ids are <10^6).

    The cache key is (path, fmt): an explicit ``fmt`` different from the
    cached parse re-parses. A corrupt/truncated cache (crash mid-write)
    falls through to a re-parse instead of poisoning every later load.
    """
    cache_path = path + (f".{fmt}" if fmt else "") + ".rmtpu.npz"
    # A cache with a missing source is valid (archives are often deleted
    # after ingest); only a NEWER source invalidates it.
    if cache and os.path.exists(cache_path) and (
            not os.path.exists(path)
            or os.path.getmtime(cache_path) >= os.path.getmtime(path)):
        try:
            with np.load(cache_path) as z:
                return {k: z[k] for k in z.files} | {
                    "n_users": int(z["user_vocab"].shape[0]),
                    "n_items": int(z["item_vocab"].shape[0]),
                }
        except Exception:
            # truncated/corrupt cache (e.g. killed mid-write): re-parse
            # and rewrite rather than raising BadZipFile forever
            pass

    if fmt is None:
        base = os.path.basename(path)
        if base.endswith(".csv"):
            fmt = "csv"
        elif base.endswith(".dat"):
            fmt = "dat"
        else:
            fmt = "tsv"
    if fmt == "csv":
        arr = _load_delimited(path, ",", skip_header=True)
    elif fmt == "dat":
        arr = _load_delimited(path, "::", skip_header=False)
    elif fmt == "tsv":
        arr = _load_delimited(path, "\t", skip_header=False)
    else:
        raise ValueError(f"unknown MovieLens format: {fmt!r}")

    users, user_vocab = _dense_remap(arr[:, 0].astype(np.int64))
    items, item_vocab = _dense_remap(arr[:, 1].astype(np.int64))
    ratings = arr[:, 2].astype(np.float32)
    out = {
        "users": users, "items": items, "ratings": ratings,
        "user_vocab": user_vocab, "item_vocab": item_vocab,
    }
    if cache:
        try:
            # atomic: a crash mid-savez must not leave a truncated cache
            # newer than the source (same tmp+replace pattern as
            # layout_cache)
            tmp = cache_path + f".tmp.{os.getpid()}"
            np.savez_compressed(tmp, **out)
            os.replace(tmp if os.path.exists(tmp) else tmp + ".npz",
                       cache_path)
        except OSError:
            pass
    out["n_users"] = int(user_vocab.shape[0])
    out["n_items"] = int(item_vocab.shape[0])
    return out


def to_csr(users: np.ndarray, items: np.ndarray, ratings: np.ndarray,
           n_users: int, n_items: int):
    """COO triplets -> scipy CSR (the reference's storage format)."""
    import scipy.sparse as sp
    return sp.csr_matrix((ratings, (users, items)), shape=(n_users, n_items))


__all__ = ["load_ratings_file", "to_csr"]
