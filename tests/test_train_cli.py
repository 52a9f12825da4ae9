"""End-to-end train CLI over a REAL-format ratings file (SURVEY.md §7 hard
part 6, N12): csv text -> native parser -> npz cache -> layout cache -> fit
-> holdout eval, all through `train.main()` exactly as a batch job would run.
"""

import json
import os

import numpy as np
import pytest

from recommendation_models_tpu import train


def _write_ratings_csv(path, n_users=60, n_items=45, n_obs=1500, seed=3):
    rng = np.random.default_rng(seed)
    u = rng.integers(1, n_users + 1, n_obs)
    i = rng.integers(1, n_items + 1, n_obs)
    # dedup (user,item) pairs so leave-n-out groups are well-formed
    key = u.astype(np.int64) * (n_items + 1) + i
    _, first = np.unique(key, return_index=True)
    u, i = u[first], i[first]
    r = rng.integers(1, 11, u.shape[0]) / 2.0
    with open(path, "w") as f:
        f.write("userId,movieId,rating,timestamp\n")
        for k in range(u.shape[0]):
            f.write(f"{u[k]},{i[k]},{r[k]},1234{k}\n")
    return u.shape[0]


def test_cli_real_format_end_to_end(tmp_path):
    csv = tmp_path / "ratings.csv"
    n = _write_ratings_csv(csv)
    jsonl = tmp_path / "metrics.jsonl"
    rc = train.main([
        "--ratings", str(csv), "--rank", "6", "--n-sweeps", "3",
        "--holdout", "1", "--platform", "cpu",
        "--metrics-jsonl", str(jsonl), "-v",
    ])
    assert rc == 0
    # parser npz cache written next to the source file
    assert os.path.exists(str(csv) + ".rmtpu.npz")
    lines = [json.loads(l) for l in open(jsonl)]
    summary = lines[-1]
    assert summary["train_rmse"] < 1.5
    assert "test_rmse" in summary and "recall_at_10" in summary
    assert 0.0 <= summary["recall_at_10"] <= 1.0

    # second run hits the npz cache (delete the csv to prove it's not reread)
    os.remove(csv)
    rc = train.main([
        "--ratings", str(csv), "--rank", "6", "--n-sweeps", "2",
        "--platform", "cpu", "-v",
    ])
    assert rc == 0


def test_cli_sharded_logs_collective_bytes(tmp_path):
    """A sharded fit's per-sweep JSONL records carry the exchange traffic
    (utils.logging 'collective bytes' — VERDICT r1 'missing' item 4)."""
    csv = tmp_path / "ratings.csv"
    _write_ratings_csv(csv)
    jsonl = tmp_path / "m.jsonl"
    rc = train.main([
        "--ratings", str(csv), "--rank", "4", "--n-sweeps", "2",
        "--n-shards", "8", "--exchange", "hybrid", "--exchange-head", "16",
        "--platform", "cpu", "--metrics-jsonl", str(jsonl),
    ])
    assert rc == 0
    lines = [json.loads(l) for l in open(jsonl)]
    per_sweep = [l for l in lines if "collective_bytes" in l]
    assert len(per_sweep) >= 2 and per_sweep[0]["collective_bytes"] > 0
    assert lines[-1]["collective_bytes_per_sweep"] > 0


def test_cli_synthetic_imc(tmp_path):
    rc = train.main([
        "--synthetic", "tiny", "--model", "imc", "--rank", "4",
        "--n-sweeps", "2", "--side-features", "6", "--platform", "cpu",
    ])
    assert rc == 0


def test_cli_checkpoint_resume(tmp_path):
    csv = tmp_path / "ratings.csv"
    _write_ratings_csv(csv)
    ckpt = tmp_path / "ckpt"
    args = ["--ratings", str(csv), "--rank", "5", "--n-sweeps", "3",
            "--platform", "cpu", "--checkpoint-dir", str(ckpt),
            "--checkpoint-every", "1"]
    assert train.main(args) == 0
    assert train.main(args + ["--resume"]) == 0
