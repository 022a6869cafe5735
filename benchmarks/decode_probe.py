"""Host decode throughput: native C++ pool vs the PIL fallback.

The multi-host feed rate-limits at per-process decode throughput (the
chip consumes batch_size·n_critic images per step; SURVEY §2.3 image
pipeline row). This probe measures both backends on THIS host over the
same position-based traversal the ordered loader uses, at the flagship
decode scale (128 px), and emits one JSON row per backend:

    python benchmarks/decode_probe.py [--dataset toyshapes128]
        [--img-size 128] [--n 2048] [--threads 8]

Wall-clock here is honest (pure host work — no TPU pool acceleration).
Context for the numbers: the faithful flagship consumes 867 img/s/chip
(r4 headline) and the deviation preset 2,004 img/s/chip — a process
feeding one chip must decode at least that fast.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", type=str, default="toyshapes128")
    ap.add_argument("--data-root", type=str, default="dataset")
    ap.add_argument("--img-size", type=int, default=128)
    ap.add_argument("--n", type=int, default=2048)
    ap.add_argument("--threads", type=int, default=8)
    args = ap.parse_args()

    from biggan_tpu.data import native_loader
    from biggan_tpu.data.pipeline import ImageFolderSource

    src = ImageFolderSource(
        os.path.join(args.data_root, args.dataset), args.img_size, seed=0
    )
    positions = np.arange(args.n)
    idx = src.indices_at(positions)

    rows = []
    if native_loader.available():
        pool = native_loader.NativeDecodePool(
            src.files, src.labels, args.img_size, n_threads=args.threads
        )
        pool.decode(idx[:64])  # warm (page cache, lib init)
        t0 = time.perf_counter()
        out = pool.decode(idx)
        dt = time.perf_counter() - t0
        rows.append({
            "backend": "native_pool", "threads": args.threads,
            "img_size": args.img_size, "n": args.n,
            "wall_s": round(dt, 3),
            "images_per_sec": round(args.n / dt, 1),
            "checksum": int(out["image"][:: max(args.n // 7, 1)].sum()),
        })
    else:
        rows.append({"backend": "native_pool", "error": "toolchain unavailable"})

    src.batch_at(positions[:64])  # warm
    t0 = time.perf_counter()
    out = src.batch_at(positions)
    dt = time.perf_counter() - t0
    rows.append({
        "backend": "pil_single_thread", "img_size": args.img_size, "n": args.n,
        "wall_s": round(dt, 3),
        "images_per_sec": round(args.n / dt, 1),
        "checksum": int(out["image"][:: max(args.n // 7, 1)].sum()),
    })
    for r in rows:
        print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
