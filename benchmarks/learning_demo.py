"""Learning demonstration: train BigGAN-32 on a structured dataset and
record the evidence (loss curves, FID trend, sample grids) → RESULTS.md.

Runs through the public facade in rounds — every round resumes from the
previous round's checkpoint (exercising restore), trains K more steps, and
evaluates FID/IS over the EMA generator. FID uses the deterministic
random-feature extractor on zero-egress hosts (``fid_random_features``) —
valid for relative trend comparison, which is what "the GAN is learning"
needs.

Usage:
    PYTHONPATH=$PYTHONPATH:/root/repo python benchmarks/learning_demo.py \
        [--rounds 6] [--steps-per-round 500] [--eval-num 2048]
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
    ap.add_argument("--rounds", type=int, default=6)
    ap.add_argument("--steps-per-round", type=int, default=500)
    ap.add_argument("--eval-num", type=int, default=2048)
    ap.add_argument("--batch-size", type=int, default=64)
    ap.add_argument("--ch", type=int, default=64)
    ap.add_argument("--img-size", type=int, default=32)
    ap.add_argument("--compute-dtype", type=str, default=None,
                    help="override preset dtype (e.g. bfloat16 at 128px)")
    ap.add_argument("--root", type=str, default="runs/learning_demo")
    ap.add_argument("--dataset-root", type=str, default="dataset")
    ap.add_argument("--n-per-class", type=int, default=500)
    # 0.99 (half-life ~69 steps), not the production 0.9999 (half-life
    # ~6.9k steps): demo-length runs must let the EMA generator actually
    # track training, or the FID trend evaluates near-init EMA weights.
    ap.add_argument("--moving-decay", type=float, default=0.99)
    ap.add_argument("--adam-mu", type=str, default=None,
                    choices=["float32", "bfloat16"],
                    help="Adam first-moment dtype (learning-parity A/B)")
    ap.add_argument("--n-critic", type=int, default=None,
                    help="D updates per G update (headline config uses 2)")
    ap.add_argument("--attn-score-dtype", type=str, default=None,
                    choices=["float32", "bfloat16"],
                    help="attention score-tile dtype (bf16 labeled-deviation "
                         "learning-parity A/B; needs img-size>=64 so the "
                         "model actually has attention)")
    ap.add_argument("--d-norm", type=str, default=None,
                    choices=["true", "false"],
                    help="BN inside D (false = the paper's SN-only D, the "
                         "biggan128_v5e_fast preset's setting)")
    ap.add_argument("--g-lr", type=float, default=None,
                    help="G Adam lr override (demo-scale balance at >=256px "
                         "needs different ratios than the large-batch paper "
                         "settings)")
    ap.add_argument("--d-lr", type=float, default=None,
                    help="D Adam lr override")
    ap.add_argument("--cpu", action="store_true", help="force the CPU backend (smoke runs)")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from biggan_tpu.configs import get_config
    from biggan_tpu.data.toy import make_toy_dataset
    from biggan_tpu.models.biggan import BigGAN

    ds_name = "toyshapes" if args.img_size == 32 else f"toyshapes{args.img_size}"
    n = make_toy_dataset(
        os.path.join(args.dataset_root, ds_name),
        n_per_class=args.n_per_class, img_size=args.img_size,
    )
    print(f"[demo] dataset ready: {n} images", flush=True)

    os.makedirs(args.root, exist_ok=True)
    history_path = os.path.join(args.root, "history.jsonl")
    history = []

    for r in range(1, args.rounds + 1):
        overrides = {}
        if args.compute_dtype:
            overrides["compute_dtype"] = args.compute_dtype
        if args.adam_mu:
            overrides["adam_mu_dtype"] = args.adam_mu
        # `is not None`, not truthiness: --g-lr 0 (freeze G for an A/B) and
        # --n-critic 0 must count as explicitly passed (ADVICE r4)
        if args.n_critic is not None:
            overrides["n_critic"] = args.n_critic
        if args.attn_score_dtype:
            overrides["attn_score_dtype"] = args.attn_score_dtype
        if args.d_norm:
            overrides["d_norm"] = args.d_norm == "true"
        if args.g_lr is not None:
            overrides["g_lr"] = args.g_lr
        if args.d_lr is not None:
            overrides["d_lr"] = args.d_lr
        cfg = get_config(
            "biggan32_cifar10",
            dataset=ds_name,
            img_size=args.img_size,
            data_root=args.dataset_root,
            moving_decay=args.moving_decay,
            ch=args.ch,
            **overrides,
            batch_size=args.batch_size,
            num_classes=10,
            epoch=1,
            iteration=r * args.steps_per_round,
            print_freq=max(args.steps_per_round // 4, 1),
            save_freq=args.steps_per_round,
            checkpoint_dir=os.path.join(args.root, "ckpt"),
            result_dir=os.path.join(args.root, "results"),
            log_dir=os.path.join(args.root, "logs"),
            sample_dir=os.path.join(args.root, "samples"),
        )
        gan = BigGAN(cfg)
        gan.build_model()
        t0 = time.time()
        gan.train()  # resumes from the round-(r-1) checkpoint
        train_s = time.time() - t0
        metrics = gan.evaluate(num_samples=args.eval_num)
        entry = {
            "round": r,
            "step": r * args.steps_per_round,
            "train_seconds": round(train_s, 1),
            **{k: (round(float(v), 4) if isinstance(v, (int, float)) else v)
               for k, v in metrics.items()},
        }
        history.append(entry)
        with open(history_path, "a") as f:
            f.write(json.dumps(entry) + "\n")
        print(f"[demo] {json.dumps(entry)}", flush=True)

    fids = [h.get("fid_random_features", h.get("fid")) for h in history]
    print(f"[demo] FID trend: {fids}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
