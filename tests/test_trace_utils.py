"""Unit test for the profiler-trace parser (biggan_tpu/utils/trace.py) —
the measurement backbone of bench.py and trace_probe (BENCH_NOTES r3b)."""

import gzip
import json
import os

from biggan_tpu.utils.trace import load_device_steps


def _write_trace(path, events):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with gzip.open(path, "wt") as f:
        json.dump({"traceEvents": events}, f)


def test_parses_tpu_lane_steps_and_ops(tmp_path):
    events = [
        {"ph": "M", "name": "process_name", "pid": 3, "args": {"name": "/device:TPU:0"}},
        {"ph": "M", "name": "process_name", "pid": 9, "args": {"name": "/host:CPU"}},
        {"ph": "M", "name": "thread_name", "pid": 3, "tid": 1, "args": {"name": "XLA Ops"}},
        {"ph": "M", "name": "thread_name", "pid": 3, "tid": 2, "args": {"name": "Steps"}},
        # two step spans, out of order; one host event to ignore
        {"ph": "X", "pid": 3, "tid": 2, "name": "jit_train_step(123)", "ts": 500.0, "dur": 99.0},
        {"ph": "X", "pid": 3, "tid": 2, "name": "jit_train_step(123)", "ts": 100.0, "dur": 101.0},
        {"ph": "X", "pid": 3, "tid": 1, "name": "fusion.7", "ts": 110.0, "dur": 50.0},
        {"ph": "X", "pid": 9, "tid": 1, "name": "host_thing", "ts": 0.0, "dur": 1e6},
    ]
    _write_trace(str(tmp_path / "plugins" / "p" / "x.trace.json.gz"), events)
    steps, ops = load_device_steps(str(tmp_path))
    assert [s["ts"] for s in steps] == [100.0, 500.0]  # sorted by start
    assert [o["name"] for o in ops] == ["fusion.7"]  # XLA Ops thread only


def test_no_tpu_lane_returns_empty(tmp_path):
    events = [
        {"ph": "M", "name": "process_name", "pid": 9, "args": {"name": "/host:CPU"}},
        {"ph": "X", "pid": 9, "tid": 1, "name": "jit_train_step(1)", "ts": 0.0, "dur": 5.0},
    ]
    _write_trace(str(tmp_path / "a" / "y.trace.json.gz"), events)
    steps, ops = load_device_steps(str(tmp_path))
    assert steps == [] and ops == []
