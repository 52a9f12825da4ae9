"""Native-parser ingest throughput at ML-25M scale (BASELINE.md 'Ingest').

Writes a real-format 25M-row ratings.csv once (cached in PB_DIR, default
/tmp), then times data.native.parse_ratings end to end into NumPy and the
np.loadtxt fallback on a 1M-row slice for the ratio.

Env: PB_ROWS (25_000_000), PB_DIR (/tmp).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    n = int(os.environ.get("PB_ROWS", 25_000_000))
    path = os.path.join(os.environ.get("PB_DIR", "/tmp"),
                        f"parser_bench_{n}.csv")
    if not os.path.exists(path):
        rng = np.random.default_rng(0)
        t0 = time.perf_counter()
        with open(path, "w") as f:
            f.write("userId,movieId,rating,timestamp\n")
            for s in range(0, n, 1_000_000):
                e = min(s + 1_000_000, n)
                u = rng.integers(1, 162_541, e - s)
                i = rng.integers(1, 62_423, e - s)
                r = rng.integers(1, 11, e - s) / 2.0
                f.write("\n".join(f"{a},{b},{c},1234567890"
                                  for a, b, c in zip(u, i, r)) + "\n")
        print(f"# wrote {os.path.getsize(path) / 2**20:.0f} MiB in "
              f"{time.perf_counter() - t0:.0f}s", file=sys.stderr)

    from recommendation_models_tpu.data import native
    sz = os.path.getsize(path)
    t0 = time.perf_counter()
    arr = native.parse_ratings(path, ",", skip_header=True)
    dt = time.perf_counter() - t0
    assert arr is not None and arr.shape == (n, 3), getattr(arr, "shape", None)
    print(f"native parser: {n} rows, {sz / 2**20:.0f} MiB in {dt:.2f}s = "
          f"{sz / 2**20 / dt:.0f} MB/s, {n / dt / 1e6:.1f} Mrows/s")

    m = min(n, 1_000_000)
    t0 = time.perf_counter()
    np.loadtxt(path, delimiter=",", usecols=(0, 1, 2), skiprows=1, max_rows=m)
    dt_np = time.perf_counter() - t0
    print(f"np.loadtxt baseline: {m} rows in {dt_np:.2f}s = "
          f"{m / dt_np / 1e6:.2f} Mrows/s ({(n / dt) / (m / dt_np):.1f}x)")


if __name__ == "__main__":
    main()
