"""ctypes binding for the native ratings parser (lazy auto-build via g++).

If the shared library is absent it is compiled on first use; any failure
falls back to the NumPy parser in ``movielens.py`` (``parse_ratings`` then
returns None). No pip/pybind11 dependency — C ABI + ctypes only.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "ratings_parser.cpp")
_LIB = os.path.join(_HERE, "_ratings_parser.so")

_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", _SRC, "-o", _LIB],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except (OSError, subprocess.SubprocessError):
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if os.environ.get("RMTPU_NO_NATIVE"):
        return None
    if not os.path.exists(_LIB) or (
            os.path.exists(_SRC)
            and os.path.getmtime(_SRC) > os.path.getmtime(_LIB)):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_LIB)
        lib.parse_ratings.restype = ctypes.c_long
        lib.parse_ratings.argtypes = [
            ctypes.c_char_p, ctypes.c_int,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_double)),
        ]
        lib.free_buffer.argtypes = [ctypes.POINTER(ctypes.c_double)]
        _lib = lib
    except OSError:
        _lib = None
    return _lib


def parse_ratings(path: str, delim: Optional[str], skip_header: bool
                  ) -> Optional[np.ndarray]:
    """Parse with the native scanner; None if unavailable.

    The native scanner is delimiter-agnostic (extracts the first three
    numeric fields per line), so ``delim`` is accepted for API symmetry with
    the NumPy fallback but unused.
    """
    del delim
    lib = _load()
    if lib is None:
        return None
    out = ctypes.POINTER(ctypes.c_double)()
    n = lib.parse_ratings(path.encode(), int(skip_header), ctypes.byref(out))
    if n < 0:
        return None
    # Zero-copy: wrap the C buffer directly (a .copy() of ML-25M's 600 MB
    # was 3.1 s of page faults — 2.5x the parse itself). np.frombuffer
    # holds a reference to `buf`; the finalizer frees the C allocation when
    # the LAST view dies.
    import weakref
    buf = (ctypes.c_double * (n * 3)).from_address(
        ctypes.addressof(out.contents))
    weakref.finalize(buf, lib.free_buffer, out)
    return np.frombuffer(buf, dtype=np.float64).reshape(n, 3)


__all__ = ["parse_ratings"]
