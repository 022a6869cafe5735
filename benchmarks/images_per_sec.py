"""Train-step throughput across model sizes — the BASELINE metric.

``python benchmarks/images_per_sec.py [--img_size 128] [--batch_size 256] ...``
prints one JSON line per configuration (same schema as bench.py, which
wraps the flagship config of this harness).
"""

from __future__ import annotations

import argparse
import json
import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from bench import run_bench  # noqa: E402


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--img_size", type=int, nargs="*", default=[128])
    p.add_argument("--batch_size", type=int, default=256)
    p.add_argument("--ch", type=int, default=96)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--attn_impl", type=str, default="auto", choices=["auto", "xla", "pallas"])
    p.add_argument("--sn_impl", type=str, default="auto", choices=["auto", "xla", "pallas"])
    p.add_argument("--n_critic", type=int, default=None,
                   help="override the preset's D:G ratio")
    p.add_argument("--remat", action="store_true",
                   help="jax.checkpoint blocks (the 256/512 memory-fit mode)")
    args = p.parse_args(argv)
    extra = {}
    if args.n_critic is not None:
        extra["n_critic"] = args.n_critic
    if args.remat:
        extra["remat"] = True
    for size in args.img_size:
        result = run_bench(
            img_size=size,
            batch_size=args.batch_size,
            ch=args.ch,
            iters=args.iters,
            attn_impl=args.attn_impl,
            sn_impl=args.sn_impl,
            **extra,
        )
        print(json.dumps(result))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
