"""Prove the FID/IS eval harness at the target scale: 50k/50k samples.

The BASELINE FID@50k clause will eventually be closed on exactly this
code path (VERDICT r3 item 6), but the harness had only ever run at
≤2,048 samples per side. This runs ``evaluate_gan`` at 50,000 per side —
random-feature Inception mode (zero egress: no pretrained weights),
toyshapes real side through the native C++ decode pool — and archives
wall time, throughput, and peak host RSS in one JSON line.

Usage: python benchmarks/eval50k.py [--num 50000] [--img-size 32]
"""

from __future__ import annotations

import argparse
import json
import os
import resource
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--num", type=int, default=50_000)
    ap.add_argument("--img-size", type=int, default=32)
    ap.add_argument("--batch-size", type=int, default=256)
    ap.add_argument("--ch", type=int, default=32)
    ap.add_argument("--n-per-class", type=int, default=200)
    ap.add_argument("--dataset-root", type=str, default="dataset")
    ap.add_argument("--root", type=str, default="runs/eval50k")
    args = ap.parse_args()

    from biggan_tpu.configs import get_config
    from biggan_tpu.data.toy import make_toy_dataset
    from biggan_tpu.eval.harness import evaluate_gan
    from biggan_tpu.models.biggan import BigGAN

    ds_name = ("toyshapes" if args.img_size == 32
               else f"toyshapes{args.img_size}")
    n = make_toy_dataset(
        os.path.join(args.dataset_root, ds_name),
        n_per_class=args.n_per_class, img_size=args.img_size,
    )
    cfg = get_config(
        "biggan32_cifar10", dataset=ds_name, img_size=args.img_size,
        data_root=args.dataset_root, ch=args.ch, batch_size=args.batch_size,
        num_classes=10,
        checkpoint_dir=os.path.join(args.root, "ckpt"),
        result_dir=os.path.join(args.root, "results"),
        log_dir=os.path.join(args.root, "logs"),
        sample_dir=os.path.join(args.root, "samples"),
    )
    gan = BigGAN(cfg)
    gan.build_model()

    t0 = time.perf_counter()
    metrics = evaluate_gan(gan, num_samples=args.num,
                           batch_size=args.batch_size)
    wall_s = time.perf_counter() - t0
    peak_rss_mb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024
    print(json.dumps({
        "num_samples_per_side": args.num,
        "dataset_images": n,
        "batch_size": args.batch_size,
        "wall_seconds": round(wall_s, 1),
        "samples_per_sec_both_sides": round(2 * args.num / wall_s, 1),
        "peak_host_rss_mb": round(peak_rss_mb, 1),
        **{k: (round(float(v), 4) if isinstance(v, (int, float)) else v)
           for k, v in metrics.items()},
    }))


if __name__ == "__main__":
    main()
