"""Parse jax profiler traces for real device timings.

The axon service VM's trace contains a genuine ``/device:TPU:0`` lane
whose per-op durations are device busy time (validated r3: op durations
fill >99.9% of each ``jit_train_step`` span, durations are invariant to
declared Pallas cost estimates, and the roofline ratio varies by op mix
— see BENCH_NOTES "Round 3b"). Client wall-clock on the pooled service
is NOT a measurement; these spans are.

Shared by ``bench.py`` (headline measurement) and
``benchmarks/trace_probe.py`` (per-variant A/B meter).
"""

from __future__ import annotations

import glob
import gzip
import json
import os


def load_device_steps(trace_dir: str, step_prefix: str = "jit_train_step"):
    """Newest trace.json.gz under ``trace_dir`` → (step spans, op events).

    Returns the ``step_prefix``-named spans and the ``XLA Ops``-thread
    events of the first TPU process lane, both as raw trace-event dicts
    (``ts``/``dur`` in microseconds). Empty lists when no TPU lane exists
    (CPU backends / profiler-less platforms).
    """
    paths = sorted(
        glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True)
    )
    if not paths:
        raise FileNotFoundError(f"no trace.json.gz under {trace_dir}")
    with gzip.open(paths[-1]) as f:
        trace = json.load(f)
    raw = trace["traceEvents"]
    pids = {e["pid"]: e["args"].get("name") for e in raw
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    tpu_pids = [p for p, n in pids.items() if "TPU" in str(n)]
    if not tpu_pids:
        return [], []
    tpu = tpu_pids[0]
    tids = {(e["pid"], e.get("tid")): e["args"].get("name") for e in raw
            if e.get("ph") == "M" and e.get("name") == "thread_name"}
    xevents = [e for e in raw if e.get("ph") == "X" and e["pid"] == tpu]
    steps = sorted(
        (e for e in xevents if str(e.get("name", "")).startswith(step_prefix)),
        key=lambda e: e["ts"],
    )
    ops = [e for e in xevents if tids.get((tpu, e.get("tid"))) == "XLA Ops"]
    return steps, ops
