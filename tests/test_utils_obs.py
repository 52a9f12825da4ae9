"""Observability utilities (SURVEY.md §5 tracing/metrics rows): direct
coverage for MetricsLogger, Timer, and the profiler trace context —
previously exercised only through the CLI."""

import json
import os

import numpy as np

from recommendation_models_tpu.utils.logging import MetricsLogger
from recommendation_models_tpu.utils.profiling import Timer, trace_sweeps


def test_metrics_logger_jsonl_and_tensorboard(tmp_path):
    jsonl = tmp_path / "m.jsonl"
    tb = tmp_path / "tb"
    m = MetricsLogger(str(jsonl), str(tb))
    m.log(1, train_rmse=0.5, collective_bytes=123)
    m.log(2, train_rmse=0.25)
    m.close()
    lines = [json.loads(l) for l in open(jsonl)]
    assert [l["step"] for l in lines] == [1, 2]
    assert lines[0]["train_rmse"] == 0.5
    assert lines[0]["collective_bytes"] == 123
    # tensorboard event files written (tensorboardX optional — skip if not)
    if os.path.isdir(tb):
        assert any(os.scandir(tb))


def test_metrics_logger_noop_paths():
    m = MetricsLogger(None, None)     # disabled sinks must be safe
    m.log(1, x=1.0)
    m.close()


def test_timer_rates():
    import time
    with Timer() as t:
        time.sleep(0.01)
    assert t.elapsed >= 0.01
    assert t.rows_per_sec(100) == 100 / t.elapsed


def test_trace_sweeps_writes_profile(tmp_path):
    import jax
    import jax.numpy as jnp
    d = tmp_path / "trace"
    with trace_sweeps(str(d)):
        np.asarray(jax.jit(lambda x: x * 2)(jnp.ones((8, 8))))
    # jax.profiler writes a plugins/profile tree under the logdir
    found = [p for p, _, files in os.walk(d) for f in files]
    assert found, "no profiler output written"


def test_trace_sweeps_none_is_noop():
    with trace_sweeps(None):
        pass
