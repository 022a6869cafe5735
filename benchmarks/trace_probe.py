"""Measure REAL device time per train step via the jax profiler trace.

The axon pool's wall-clock is unusable for measurement (pooled-fast acks
below single-chip physics, BENCH_NOTES "Physics check") and XLA cost
analysis is a byte/FLOP *model* — it told us the step's roofline floor
but not how far real silicon runs from it. The profiler trace closes the
gap: the service's VM emits a real ``/device:TPU:0`` lane with per-XLA-op
busy times, and the per-step ``jit_train_step`` span is genuine device
wall time (op durations fill >99.9% of the span — no queue gaps).

For each variant this compiles the bench step, traces ``--steps`` of it,
and prints one JSON line: device ms/step, derived img/s, the roofline
floor for comparison, and the top op groups — a real-silicon A/B meter.

Usage: python benchmarks/trace_probe.py [--variants base,attn_xla] [--steps 3]
"""

from __future__ import annotations

import argparse
import collections
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from biggan_tpu.utils.trace import load_device_steps as _load_device_steps  # noqa: E402


def _op_groups(steps, ops, top=8):
    if not steps:
        return {}
    s0 = steps[0]
    by = collections.Counter()
    for e in ops:
        if s0["ts"] <= e["ts"] < s0["ts"] + s0["dur"]:
            by[str(e["name"]).split(".")[0]] += e.get("dur", 0)
    return {n: round(d / 1e3, 1) for n, d in by.most_common(top)}


def probe(name: str, overrides: dict, steps: int) -> dict:
    import jax

    from bench import build_bench_step, chip_peaks

    cfg, state, step_fn, make_batch = build_bench_step(**overrides)
    batch = make_batch()
    peak_flops, peak_bw, kind, _ = chip_peaks()
    try:
        ca = step_fn.lower(state, batch).compile().cost_analysis()
        floor_ms = 1e3 * max(ca.get("flops", 0.0) / peak_flops,
                             ca.get("bytes accessed", 0.0) / peak_bw)
    except Exception:
        # cost analysis can fail for large programs (the b512 row) —
        # the chip kind is still known; only the floor is absent
        floor_ms = None

    state, m = step_fn(state, batch)  # warm (compile outside the trace)
    jax.block_until_ready(m)
    tdir = tempfile.mkdtemp(prefix=f"trace_{name}_")
    with jax.profiler.trace(tdir):
        for _ in range(steps):
            state, m = step_fn(state, batch)
        jax.block_until_ready(m)

    spans, ops = _load_device_steps(tdir)
    out = {"variant": name, "chip": kind,
           "roofline_floor_ms": round(floor_ms, 1) if floor_ms else None}
    if spans:
        durs = [e["dur"] / 1e3 for e in spans]
        best = min(durs)
        imgs = cfg.batch_size * cfg.n_critic
        out.update(
            device_ms_per_step=round(best, 1),
            device_ms_all=[round(d, 1) for d in durs],
            images_per_sec_measured=round(imgs / best * 1e3, 1),
            pct_of_roofline=round(100 * floor_ms / best, 1) if floor_ms else None,
            top_op_groups=_op_groups(spans, ops),
        )
    else:
        out["error"] = "no device lane in trace (profiler unsupported here)"
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", type=str, default="base")
    ap.add_argument("--steps", type=int, default=3)
    args = ap.parse_args()

    from hbm_bytes import VARIANTS  # same variant vocabulary

    for name in args.variants.split(","):
        try:
            base = dict(batch_size=32, n_critic=1)
            base.update(VARIANTS[name])
            print(json.dumps(probe(name, base, args.steps)), flush=True)
        except Exception as e:
            print(json.dumps({"variant": name, "error": repr(e)[:200]}), flush=True)


if __name__ == "__main__":
    main()
