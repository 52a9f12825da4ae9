"""Flake-proof bench harness (VERDICT r3 task 1).

BENCH_r03 was lost to a single transient UNAVAILABLE raised from the first
H2D placement over the wedged TPU tunnel. These tests pin the contract:
transient device errors are retried with backend re-init + backoff, the
layout memo makes retries cheap, and a final failure still emits one
parseable JSON line with an "error" field.
"""

import json
import sys
import os

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


class FakeUnavailable(RuntimeError):
    pass


def _unavailable():
    return FakeUnavailable(
        "UNAVAILABLE: TPU backend setup/compile error: tunnel wedged")


def test_transient_classifier():
    assert bench._is_transient(_unavailable())
    assert bench._is_transient(RuntimeError("DEADLINE_EXCEEDED: rpc"))
    assert not bench._is_transient(ValueError("rank must be positive"))
    assert not bench._is_transient(RuntimeError("Cholesky failed: not PSD"))
    # deterministic errors must NOT be retried (r4 review: each false
    # positive costs ~3 min of backoff + two cold tunnel re-dials)
    assert not bench._is_transient(
        RuntimeError("INTERNAL: Mosaic failed to compile"))
    assert not bench._is_transient(
        ValueError("Internal connection string invalid"))


def test_retry_zero_attempts_still_runs_once(monkeypatch):
    """BENCH_RETRIES=0 must mean 'one attempt', never 'return None without
    calling fn' (r4 review: that silently broke the always-emit-JSON
    contract and entry()'s return value)."""
    monkeypatch.setenv("BENCH_RETRIES", "0")
    assert bench.run_with_retry(lambda: "ran") == "ran"
    assert bench.run_with_retry(lambda: "ran", attempts=0) == "ran"


def test_retry_recovers_after_one_transient():
    calls = {"n": 0, "resets": 0, "slept": []}

    def flaky():
        calls["n"] += 1
        if calls["n"] == 1:
            raise _unavailable()
        return "ok"

    out = bench.run_with_retry(
        flaky, attempts=3, backoffs=(0.0,),
        sleep=lambda s: calls["slept"].append(s),
        reset=lambda: calls.__setitem__("resets", calls["resets"] + 1))
    assert out == "ok"
    assert calls["n"] == 2 and calls["resets"] == 1 and calls["slept"] == [0.0]


def test_retry_propagates_non_transient_immediately():
    calls = {"n": 0}

    def bad():
        calls["n"] += 1
        raise ValueError("config error")

    with pytest.raises(ValueError):
        bench.run_with_retry(bad, attempts=3, backoffs=(0.0,),
                             sleep=lambda s: None, reset=lambda: None)
    assert calls["n"] == 1


def test_retry_exhaustion_raises_last_transient():
    def always_down():
        raise _unavailable()

    with pytest.raises(FakeUnavailable):
        bench.run_with_retry(always_down, attempts=2, backoffs=(0.0,),
                             sleep=lambda s: None, reset=lambda: None)


def test_cli_emits_parseable_error_record(monkeypatch, capsys):
    """Even total failure must leave the driver a parseable JSON line
    (BENCH_r03 was recorded as rc=1 / parsed=null — never again)."""
    monkeypatch.setattr(bench, "run_with_retry",
                        lambda fn, **kw: (_ for _ in ()).throw(_unavailable()))
    with pytest.raises(SystemExit) as ei:
        bench.cli()
    assert ei.value.code == 0
    line = capsys.readouterr().out.strip().splitlines()[-1]
    rec = json.loads(line)
    assert rec["metric"] == "bench_failed"
    assert "UNAVAILABLE" in rec["error"]
    assert set(rec) >= {"metric", "value", "unit", "vs_baseline"}
    # failure schema (r5): value is -1 and unit is "error" — no real metric
    # is ever negative, so a parsed failure can't pass for a tiny green run
    assert rec["value"] == -1.0 and rec["unit"] == "error"
    assert rec["vs_baseline"] == -1.0


@pytest.mark.slow
def test_bench_completes_when_placement_fails_once(monkeypatch, capsys):
    """End-to-end: the first device_buckets placement raises UNAVAILABLE;
    the retry (with the in-process layout memo) completes the tiny bench
    and the JSON line is intact."""
    import recommendation_models_tpu.solver.als_sweep as sweep_mod

    real = sweep_mod.device_buckets
    state = {"n": 0}

    def flaky_buckets(*a, **kw):
        state["n"] += 1
        if state["n"] == 1:
            raise _unavailable()
        return real(*a, **kw)

    monkeypatch.setattr(bench, "_reset_backend", lambda: None)
    monkeypatch.setenv("BENCH_SCALE", "tiny")
    monkeypatch.setenv("BENCH_RANK", "8")
    monkeypatch.setenv("BENCH_SWEEPS", "2")
    monkeypatch.setenv("BENCH_ORACLE_ROWS", "200")
    monkeypatch.setenv("BENCH_SOLVER", "xla")
    monkeypatch.setenv("BENCH_DTYPE", "float32")
    bench._LAYOUT_MEMO.clear()
    # patch the module-global the bench actually calls
    import recommendation_models_tpu.solver.als_sweep as m
    monkeypatch.setattr(m, "device_buckets", flaky_buckets)

    bench.run_with_retry(bench.main, attempts=3, backoffs=(0.0,),
                         sleep=lambda s: None, reset=lambda: None)
    out = capsys.readouterr().out.strip().splitlines()[-1]
    rec = json.loads(out)
    assert rec["value"] > 0 and "error" not in rec
    # roofline observability fields (VERDICT r4 weak #6): regressions must
    # be visible against the structural gather roof in every train record
    assert rec["extra"]["gathered_rows_per_epoch"] > 0
    assert rec["extra"]["gather_roof_rows_per_s"] == 175e6
    assert 0 < rec["extra"]["roof_fraction"]
    assert state["n"] >= 2           # first call failed, retry re-ran it
    assert len(bench._LAYOUT_MEMO) == 1   # rebuild skipped on attempt 2


def test_watchdog_emits_record_on_hang(monkeypatch):
    """A wedged tunnel can HANG (not raise) for ~30 min; the cli watchdog
    must emit the parseable error record and exit 0 before any outer
    capture timeout. Run in a subprocess (the watchdog os._exits)."""
    import subprocess, sys, os, json
    code = (
        "import os, time, json, sys\n"
        "sys.path.insert(0, %r)\n"
        "import bench\n"
        "bench.main = lambda: time.sleep(60)\n"   # simulated hang
        "bench.cli()\n" % os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
    env = dict(os.environ, BENCH_DEADLINE_S="2", JAX_PLATFORMS="cpu")
    out = subprocess.run([sys.executable, "-c", code], env=env,
                         capture_output=True, text=True, timeout=30)
    assert out.returncode == 0
    rec = json.loads(out.stdout.strip().splitlines()[-1])
    assert rec["metric"] == "bench_failed"
    assert "BENCH_DEADLINE_S" in rec["error"]
    assert rec["value"] == -1.0 and rec["unit"] == "error"
