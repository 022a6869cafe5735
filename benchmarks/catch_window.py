"""Catch a single-chip-consistent measured window for the headline step.

The axon pool mostly executes in the accelerated regime (wall-clock below
one-chip physics), so `bench.py`'s headline often clamps to the roofline
bound. This sampler keeps the compiled flagship step warm and times short
windows every ``--interval`` seconds for ``--minutes``; any window at or
above the step's own roofline floor is a genuine single-chip measurement
and is recorded to ``--out`` (JSONL) for BENCH_NOTES.

Usage: python benchmarks/catch_window.py [--minutes 60] [--interval 120]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--minutes", type=float, default=60)
    ap.add_argument("--interval", type=float, default=120)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--out", type=str, default="/tmp/window_catch.jsonl")
    args = ap.parse_args()

    import jax

    from bench import build_bench_step, chip_peaks

    cfg, state, step_fn, make_batch = build_bench_step()
    batch = make_batch()
    try:
        ca = step_fn.lower(state, batch).compile().cost_analysis()
        floor_flops, floor_bytes = ca.get("flops", 0.0), ca.get("bytes accessed", 0.0)
    except Exception:
        floor_flops = floor_bytes = 0.0
    peak_flops, peak_bw, kind, _ = chip_peaks()
    floor_s = max(floor_flops / peak_flops, floor_bytes / peak_bw)
    if floor_s == 0.0:
        print("[catch] no cost model available — cannot classify windows")
        return 1
    print(f"[catch] {kind}: roofline floor {floor_s * 1e3:.1f} ms", flush=True)

    state, metrics = step_fn(state, batch)  # warm
    jax.block_until_ready(metrics)

    deadline = time.time() + args.minutes * 60
    caught = 0
    with open(args.out, "a") as f:
        while time.time() < deadline:
            t0 = time.perf_counter()
            for _ in range(args.iters):
                state, metrics = step_fn(state, batch)
            jax.block_until_ready(metrics)
            w = (time.perf_counter() - t0) / args.iters
            rec = {
                "t": round(time.time(), 1),
                "step_ms": round(w * 1e3, 2),
                "floor_ms": round(floor_s * 1e3, 2),
                "consistent": w >= floor_s,
            }
            f.write(json.dumps(rec) + "\n")
            f.flush()
            if w >= floor_s:
                caught += 1
                print(f"[catch] MEASURED single-chip window: {w * 1e3:.1f} ms "
                      f"(floor {floor_s * 1e3:.1f})", flush=True)
            time.sleep(args.interval)
    print(f"[catch] done; {caught} consistent windows", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
