"""Attribute the train step's HBM traffic to individual HLO ops.

``cost_analysis()`` gives only aggregates; this parses the compiled
module's entry computation and sums output+operand bytes per instruction
(the same accounting XLA's cost model uses post-fusion), then prints the
top consumers grouped by op kind and by originating source name — telling
us *where* the batch-independent ~37 GB/step actually lives.

Approximation notes: operands that are other instructions' outputs are
counted once per use (that IS a read); parameters/constants likewise.
Nested fusion computations are not descended into (a fusion's interior
stays in registers/VMEM — exactly why only its boundary counts).

Usage: python benchmarks/hlo_bytes.py [--batch 32] [--top 30]
"""

from __future__ import annotations

import argparse
import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

_DTYPE_BYTES = {
    "f64": 8, "f32": 4, "bf16": 2, "f16": 2,
    "s64": 8, "s32": 4, "s16": 2, "s8": 1,
    "u64": 8, "u32": 4, "u16": 2, "u8": 1, "pred": 1,
}
_SHAPE_RE = re.compile(r"\b(f64|f32|bf16|f16|s64|s32|s16|s8|u64|u32|u16|u8|pred)\[([0-9,]*)\]")


def _shape_bytes(m) -> int:
    dtype, dims = m.group(1), m.group(2)
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n * _DTYPE_BYTES[dtype]


def entry_lines(hlo_text: str):
    """Yield instruction lines of the ENTRY computation only."""
    in_entry = False
    for line in hlo_text.splitlines():
        if line.startswith("ENTRY"):
            in_entry = True
            continue
        if in_entry:
            if line.startswith("}"):
                return
            yield line


def analyze(hlo_text: str):
    per_op = []
    for line in entry_lines(hlo_text):
        line = line.strip()
        if not line or "=" not in line:
            continue
        name = line.split("=", 1)[0].strip()
        shapes = list(_SHAPE_RE.finditer(line))
        if not shapes:
            continue
        # op kind: first token after '=' that looks like an opcode
        rhs = line.split("=", 1)[1]
        kind_m = re.search(r"\)?\s*([a-z][a-z0-9-]*)\(", rhs)
        kind = kind_m.group(1) if kind_m else "?"
        if kind in ("get-tuple-element", "tuple", "parameter", "bitcast", "reshape"):
            continue  # zero-copy aliases, not HBM traffic
        if "slice" in name or kind in ("slice", "dynamic-slice"):
            # slice ops (incl. async VMEM-prefetch slices of weight
            # kernels) read only the sliced window, not the whole
            # operand — count output bytes only, or kernel prefetches
            # get multiply-counted per slice (observed ~4× inflation)
            total = _shape_bytes(shapes[0])
        else:
            total = sum(_shape_bytes(m) for m in shapes)
        # metadata op_name gives the JAX-level source
        meta = re.search(r'op_name="([^"]*)"', line)
        src = meta.group(1) if meta else ""
        fm = re.search(r'source_file="([^"]*)" source_line=(\d+)', line)
        site = f"{os.path.basename(fm.group(1))}:{fm.group(2)}" if fm else ""
        per_op.append((total, kind, name, src, site))
    return per_op


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--dump", type=str, default="",
                    help="also write the full HLO text to this path")
    ap.add_argument("--file", type=str, default="",
                    help="analyze a previously dumped HLO text (no chip needed)")
    args = ap.parse_args()

    if args.file:
        _report(open(args.file).read(), args.top)
        return

    from bench import build_bench_step  # SAME program as the headline bench

    # n_critic pinned to 1 so byte maps stay comparable with the archived
    # r2 dump and the hbm_bytes tables (bench.py itself now runs the
    # preset's n_critic=2)
    cfg, state, step_fn, make_batch = build_bench_step(batch_size=args.batch, n_critic=1)
    compiled = step_fn.lower(state, make_batch()).compile()
    text = compiled.as_text()
    if args.dump:
        with open(args.dump, "w") as f:
            f.write(text)
        print(f"dumped {len(text)} chars to {args.dump}")
    _report(text, args.top)


def _report(text: str, top: int):
    per_op = analyze(text)
    total = sum(t for t, *_ in per_op)
    print(f"total attributed: {total / 2**30:.1f} GiB across {len(per_op)} entry ops")

    by_kind = defaultdict(int)
    for t, kind, *_ in per_op:
        by_kind[kind] += t
    print("\n== by op kind ==")
    for kind, t in sorted(by_kind.items(), key=lambda kv: -kv[1])[:15]:
        print(f"{t / 2**30:8.2f} GiB  {kind}")

    # group by JAX-level module path (first segments of metadata op_name,
    # jit(train_step)/ stripped): where in the model the bytes live
    by_path = defaultdict(int)
    for t, _, _, src, _ in per_op:
        p = src.replace("jit(train_step)/", "")
        by_path["/".join(p.split("/")[:3]) if p else "(no metadata)"] += t
    print("\n== by module path (top 25) ==")
    for p, t in sorted(by_path.items(), key=lambda kv: -kv[1])[:25]:
        print(f"{t / 2**30:8.2f} GiB  {p}")

    # group by source site (file:line of the representative op)
    by_site = defaultdict(int)
    for t, _, _, _, site in per_op:
        by_site[site or "(none)"] += t
    print("\n== by source site (top 25) ==")
    for s, t in sorted(by_site.items(), key=lambda kv: -kv[1])[:25]:
        print(f"{t / 2**30:8.2f} GiB  {s}")

    print(f"\n== top {top} single ops ==")
    for t, kind, name, src, site in sorted(per_op, key=lambda x: -x[0])[:top]:
        print(f"{t / 2**30:8.3f} GiB  {kind:12s} {name[:40]:40s} {site:24s} {src[:70]}")


if __name__ == "__main__":
    main()
