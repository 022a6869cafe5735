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
import re
from collections import defaultdict

import numpy as np

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
        total = sum(_shape_bytes(m) for m in shapes)
        # op kind: first token after '=' that looks like an opcode
        rhs = line.split("=", 1)[1]
        kind_m = re.search(r"\)?\s*([a-z][a-z0-9-]*)\(", rhs)
        kind = kind_m.group(1) if kind_m else "?"
        # metadata op_name gives the JAX-level source
        meta = re.search(r'op_name="([^"]*)"', line)
        src = meta.group(1) if meta else ""
        per_op.append((total, kind, name, src))
    return per_op


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--dump", type=str, default="",
                    help="also write the full HLO text to this path")
    args = ap.parse_args()

    import jax

    from biggan_tpu.configs import get_config
    from biggan_tpu.parallel.mesh import create_mesh
    from biggan_tpu.parallel.sharding import batch_sharding, replicate
    from biggan_tpu.training.train_state import create_train_state
    from biggan_tpu.training.train_step import make_train_step

    cfg = get_config(
        "biggan128_paper", img_size=128, ch=96, batch_size=args.batch,
        n_critic=1, grad_accum=1, num_classes=1000,
        compute_dtype="bfloat16", dataset="synthetic",
    )
    mesh = create_mesh(cfg.mesh_shape, cfg.mesh_axes)
    state = replicate(create_train_state(cfg, jax.random.PRNGKey(0)), mesh)
    step_fn = jax.jit(make_train_step(cfg), donate_argnums=0)
    rng = np.random.RandomState(0)
    batch = jax.device_put(
        {
            "image": rng.randint(
                0, 256, (1, cfg.batch_size, cfg.img_size, cfg.img_size, 3)
            ).astype(np.uint8),
            "label": rng.randint(0, cfg.num_classes, (1, cfg.batch_size)).astype(np.int32),
        },
        batch_sharding(mesh, batch_dim=1),
    )
    compiled = step_fn.lower(state, batch).compile()
    text = compiled.as_text()
    if args.dump:
        with open(args.dump, "w") as f:
            f.write(text)
        print(f"dumped {len(text)} chars to {args.dump}")
    per_op = analyze(text)
    total = sum(t for t, *_ in per_op)
    print(f"total attributed: {total / 2**30:.1f} GiB across {len(per_op)} entry ops")

    by_kind = defaultdict(int)
    for t, kind, *_ in per_op:
        by_kind[kind] += t
    print("\n== by op kind ==")
    for kind, t in sorted(by_kind.items(), key=lambda kv: -kv[1])[:15]:
        print(f"{t / 2**30:8.2f} GiB  {kind}")

    print(f"\n== top {args.top} single ops ==")
    for t, kind, name, src in sorted(per_op, key=lambda x: -x[0])[: args.top]:
        print(f"{t / 2**30:8.3f} GiB  {kind:12s} {name[:48]:48s} {src[:80]}")


if __name__ == "__main__":
    main()
