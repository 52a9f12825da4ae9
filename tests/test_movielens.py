"""MovieLens parser tests over all three on-disk formats (SURVEY.md N12),
exercising the native C++ scanner when it builds and the NumPy fallback."""

import os

import numpy as np
import pytest

from recommendation_models_tpu.data import movielens
from recommendation_models_tpu.data import native

ROWS = [(1, 10, 4.0), (1, 20, 3.5), (2, 10, 5.0), (3, 30, 1.0)]


def _write(tmp_path, name, sep, header=None):
    p = tmp_path / name
    lines = [] if header is None else [header]
    lines += [sep.join(str(x) for x in (u, i, r)) + sep + "881250949"
              for u, i, r in ROWS]
    p.write_text("\n".join(lines) + "\n")
    return str(p)


def _check(out):
    assert out["n_users"] == 3 and out["n_items"] == 3
    np.testing.assert_array_equal(out["user_vocab"], [1, 2, 3])
    np.testing.assert_array_equal(out["item_vocab"], [10, 20, 30])
    np.testing.assert_allclose(out["ratings"], [4.0, 3.5, 5.0, 1.0])
    # dense remap: first row is user 1 -> 0, item 10 -> 0
    assert out["users"][0] == 0 and out["items"][0] == 0


def test_ml100k_format(tmp_path):
    path = _write(tmp_path, "u.data", "\t")
    _check(movielens.load_ratings_file(path, cache=False))


def test_ml1m_format(tmp_path):
    path = _write(tmp_path, "ratings.dat", "::")
    _check(movielens.load_ratings_file(path, cache=False))


def test_ml25m_format(tmp_path):
    path = _write(tmp_path, "ratings.csv", ",",
                  header="userId,movieId,rating,timestamp")
    _check(movielens.load_ratings_file(path, cache=False))


def test_cache_roundtrip(tmp_path):
    path = _write(tmp_path, "ratings.csv", ",",
                  header="userId,movieId,rating,timestamp")
    a = movielens.load_ratings_file(path, cache=True)
    assert os.path.exists(path + ".rmtpu.npz")
    b = movielens.load_ratings_file(path, cache=True)  # served from cache
    np.testing.assert_array_equal(a["users"], b["users"])
    np.testing.assert_allclose(a["ratings"], b["ratings"])


def test_native_parser_if_available(tmp_path):
    path = _write(tmp_path, "ratings.csv", ",",
                  header="userId,movieId,rating,timestamp")
    arr = native.parse_ratings(path, ",", True)
    if arr is None:
        pytest.skip("native parser unavailable (no g++?)")
    assert arr.shape == (4, 3)
    np.testing.assert_allclose(arr[:, 2], [4.0, 3.5, 5.0, 1.0])
    # fallback agreement
    arr2 = movielens._load_delimited(path, ",", True)
    np.testing.assert_allclose(arr, arr2[:, :3] if arr2.shape[1] > 3 else arr2)


def test_to_csr(tmp_path):
    path = _write(tmp_path, "u.data", "\t")
    out = movielens.load_ratings_file(path, cache=False)
    R = movielens.to_csr(out["users"], out["items"], out["ratings"],
                         out["n_users"], out["n_items"])
    assert R.shape == (3, 3) and R.nnz == 4


def test_native_parser_chunked_streaming(tmp_path):
    """The streaming parser must cross 4MB chunk boundaries cleanly: every
    row of a >8MB csv (header + partial-final-line handling) parses exactly,
    matching the values written."""
    import numpy as np
    from recommendation_models_tpu.data import native

    rng = np.random.default_rng(0)
    n = 400_000
    u = rng.integers(1, 5_000, n)
    i = rng.integers(1, 8_000, n)
    r = rng.integers(1, 11, n) / 2.0
    path = tmp_path / "big_ratings.csv"
    with open(path, "w") as f:
        f.write("userId,movieId,rating,timestamp\n")
        for k in range(n):
            f.write(f"{u[k]},{i[k]},{r[k]},123456789\n")
    assert path.stat().st_size > 8 << 20   # > two 4MB chunks
    arr = native.parse_ratings(str(path), ",", skip_header=True)
    if arr is None:
        import pytest
        pytest.skip("native parser unavailable")
    assert arr.shape == (n, 3)
    np.testing.assert_array_equal(arr[:, 0], u)
    np.testing.assert_array_equal(arr[:, 1], i)
    np.testing.assert_allclose(arr[:, 2], r)


def test_native_parser_no_trailing_newline(tmp_path):
    from recommendation_models_tpu.data import native
    import numpy as np
    path = tmp_path / "r.csv"
    with open(path, "w") as f:
        f.write("userId,movieId,rating\n1,2,3.5\n7,8,4.0")  # no final \n
    arr = native.parse_ratings(str(path), ",", skip_header=True)
    if arr is None:
        import pytest
        pytest.skip("native parser unavailable")
    np.testing.assert_allclose(arr, [[1, 2, 3.5], [7, 8, 4.0]])


def test_cache_corruption_recovers_and_fmt_keys(tmp_path):
    """r4 review: a truncated cache must re-parse (not BadZipFile forever);
    an explicit fmt keys its own cache entry instead of silently serving a
    different format's parse."""
    p = str(tmp_path / "u.data")
    with open(p, "w") as f:
        f.write("1\t10\t4.0\t0\n2\t20\t3.0\t0\n")
    d1 = movielens.load_ratings_file(p)
    assert d1["n_users"] == 2
    # corrupt the cache in place
    with open(p + ".rmtpu.npz", "wb") as f:
        f.write(b"NOT A ZIP")
    import os, time
    os.utime(p + ".rmtpu.npz", (time.time() + 10, time.time() + 10))
    d2 = movielens.load_ratings_file(p)               # falls through to re-parse
    np.testing.assert_array_equal(d2["users"], d1["users"])
    # explicit fmt gets its own cache entry (path-only key served the
    # wrong format's parse before)
    d3 = movielens.load_ratings_file(p, fmt="tsv")
    assert os.path.exists(p + ".tsv.rmtpu.npz")
    np.testing.assert_array_equal(d3["ratings"], d1["ratings"])
