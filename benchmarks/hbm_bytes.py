"""Per-variant HBM-byte probe for the BigGAN-128 train step.

The step is HBM-bandwidth-bound on a single v5e (BENCH_NOTES.md roofline:
64.3 GB/step ≈ 90% of 819 GB/s at the measured 86.8 ms), so the lever is
bytes, not FLOPs. This probe compiles the fused train step under config
variants and prints XLA's cost analysis (TFLOP + GB per step) plus, with
``--time``, best-of-N timed windows — giving a deterministic byte
comparison even when the time-shared chip is noisy.

Usage:  python benchmarks/hbm_bytes.py [--time] [--variants base,remat,...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

VARIANTS = {
    # name -> config overrides on top of the bench config
    "base": {},
    "remat": {"remat": True},
    "attn_xla": {"attn_impl": "xla"},
    "sn_xla": {"sn_impl": "xla"},
    "no_dnorm": {"d_norm": False},
    "nn_conv": {"g_up_mode": "nn_conv"},
    "fused_gd": {"fused_gd": True},
    "fused_gd_remat": {"fused_gd": True, "remat": True},
    "base_b64": {"batch_size": 64},
    "base_b128": {"batch_size": 128},
    "base_b256": {"batch_size": 256},
    # component isolation for the ~50 GB/step batch-independent pool:
    # each removes one fixed-cost contributor; the delta vs base is its
    # share of the traffic
    "no_sn": {"sn": False},
    "no_ortho": {"ortho_reg": 0.0},
    "no_gradnorms": {"log_grad_norms": False},
    "f32": {"compute_dtype": "float32"},
    "bf16_mu": {"adam_mu_dtype": "bfloat16"},
    "matw": {"materialize_weights": True},
    "matw_b256": {"materialize_weights": True, "batch_size": 256},
    # r3: pinned-residual BN backward A/B (norm_bwd="ref" = naive autodiff,
    # the r2 baseline) and the per-image-byte levers at the headline batch
    "norm_pinned": {"norm_bwd": "pinned"},
    "norm_pinned_b256": {"norm_bwd": "pinned", "batch_size": 256},
    "fused_gd_b256": {"fused_gd": True, "batch_size": 256},
    "bf16_mu_b256": {"adam_mu_dtype": "bfloat16", "batch_size": 256},
    "ncritic2": {"n_critic": 2},
    "ncritic2_b256": {"n_critic": 2, "batch_size": 256},
    # r3d: Pallas conv/deconv kernels for the measured-win shape classes.
    # "auto" means XLA everywhere (use_pallas_conv returns False unless
    # impl == "pallas"); "pallas" is the A/B on-switch, so the pconv
    # variant must set it explicitly. "conv_xla" rows are kept as the
    # explicit-off spelling even though they equal base.
    "conv_xla": {"conv_impl": "xla"},
    "conv_xla_b256": {"conv_impl": "xla", "n_critic": 2, "batch_size": 256},
    "ncritic2_b256_pconv": {"conv_impl": "pallas", "n_critic": 2,
                            "batch_size": 256},
    # labeled DEVIATION config for the >=2000 img/s/chip target on v5e
    # (BASELINE's north star names a TPU v4, where the faithful ch=96
    # preset is already past the bar by roofline; v5e's MXU peak caps the
    # faithful config at ~1757): half-width channels, same architecture.
    "dev_ch64_b256": {"ch": 64, "n_critic": 2, "batch_size": 256},
    "dev_ch48_b256": {"ch": 48, "n_critic": 2, "batch_size": 256},
    # r4: deviation-config decision rows (VERDICT r3 missing #5): ch=64
    # alone, plus the paper-faithful d_norm=False (+1.8% measured r3) and
    # bf16 Adam moments stacked on top
    "dev_ch64_nodnorm": {"ch": 64, "n_critic": 2, "batch_size": 256,
                         "d_norm": False},
    "dev_ch64_full": {"ch": 64, "n_critic": 2, "batch_size": 256,
                      "d_norm": False, "adam_mu_dtype": "bfloat16"},
    "dev_ch48_nodnorm": {"ch": 48, "n_critic": 2, "batch_size": 256,
                         "d_norm": False},
    # bf16 score-tile attention (labeled numerics deviation) on the
    # faithful flagship and stacked on the v5e_fast deviation shape
    "attn_bf16_n2_b256": {"attn_score_dtype": "bfloat16", "n_critic": 2,
                          "batch_size": 256},
    "dev_ch48_full": {"ch": 48, "n_critic": 2, "batch_size": 256,
                      "d_norm": False, "attn_score_dtype": "bfloat16"},
    # r4b: the winning deviation shape at per-chip batch 512 (the compile
    # relay's single-microbatch ceiling) — does the fixed pool amortize
    # further past the preset's 256?
    "dev_ch48_b512": {"ch": 48, "n_critic": 2, "batch_size": 512,
                      "d_norm": False},
    # r4: remat A/B at the 256px preset on the real meter (the r2 byte
    # model said remat loses at 128px; the 256 preset ships with it on)
    "p256_b64_noremat": {"img_size": 256, "batch_size": 64, "remat": False,
                         "z_dim": 140},
    "p256_b64_n2_noremat": {"img_size": 256, "batch_size": 64, "remat": False,
                            "n_critic": 2, "z_dim": 140},
    "p512_b16_n2": {"img_size": 512, "batch_size": 16, "remat": True,
                    "n_critic": 2, "z_dim": 160},
    # grad-accum amortization of the batch-independent pool: per-chip
    # virtual batches toward the paper's global 2048 (micro stays 256)
    "ga2_b512": {"batch_size": 512, "grad_accum": 2},
    "ga4_b1024": {"batch_size": 1024, "grad_accum": 4},
    "fused_gd_ga2_b512": {"fused_gd": True, "batch_size": 512, "grad_accum": 2},
    # the 256/512px BASELINE presets (biggan256_ici / biggan512_pod shapes
    # on one chip: remat on, per-chip batch share)
    "p256_b64": {"img_size": 256, "batch_size": 64, "remat": True, "z_dim": 140},
    "p256_b64_n2": {"img_size": 256, "batch_size": 64, "remat": True, "n_critic": 2,
                    "z_dim": 140},
    "p512_b16": {"img_size": 512, "batch_size": 16, "remat": True, "z_dim": 160},
    # r4b: the remaining BASELINE presets 1-2, measured at their shipped
    # shapes (32px stays float32 as the preset does; 64px bf16) so every
    # config row in BASELINE.json has a device-trace measurement
    "p32_b64": {"img_size": 32, "batch_size": 64, "ch": 64, "z_dim": 128,
                "num_classes": 10, "compute_dtype": "float32"},
    "p64_b256": {"img_size": 64, "batch_size": 256, "ch": 64, "z_dim": 120},
    "ncritic2_b256_bf16mu": {"n_critic": 2, "batch_size": 256,
                             "adam_mu_dtype": "bfloat16"},
    # real-silicon attention A/B at the headline config (trace_probe.py);
    # verdicts in BENCH_NOTES "Round 3b" — Pallas attention wins 1.6x
    "attn_xla_n2_b256": {"attn_impl": "xla", "n_critic": 2, "batch_size": 256},
    "sn_xla_n2_b256": {"sn_impl": "xla", "n_critic": 2, "batch_size": 256},
    # real-silicon upsampler A/B: stride-2 deconvs may run at poor MXU
    # efficiency; nn_conv (the paper's scheme) trades 2x model FLOPs for
    # dense convs — only the device trace can rank them
    "nn_conv_n2_b256": {"g_up_mode": "nn_conv", "n_critic": 2, "batch_size": 256},
    "no_dnorm_n2_b256": {"d_norm": False, "n_critic": 2, "batch_size": 256},
}


def probe(name: str, overrides: dict, timed: bool, iters: int = 10) -> dict:
    import jax

    from bench import build_bench_step, chip_peaks  # SAME program as the headline bench

    # fixed-pool effects show best at small batch; n_critic pinned to 1 so
    # byte tables stay comparable across rounds (bench.py now lets the
    # preset's n_critic=2 through for the headline)
    base = dict(batch_size=32, n_critic=1)
    base.update(overrides)
    cfg, state, step_fn, make_batch = build_bench_step(**base)
    batch = make_batch()
    compiled = step_fn.lower(state, batch).compile()
    ca = compiled.cost_analysis()
    peak_flops, peak_bw, _, _ = chip_peaks()
    out = {
        "variant": name,
        "tflops": round(ca.get("flops", 0.0) / 1e12, 3),
        "hbm_gb": round(ca.get("bytes accessed", 0.0) / 2**30, 2),
        # roofline floor on this chip: max(compute, bandwidth) bound
        "floor_ms": round(
            1e3 * max(ca.get("flops", 0.0) / peak_flops,
                      ca.get("bytes accessed", 0.0) / peak_bw), 1
        ),
    }
    if timed:
        for _ in range(3):
            state, metrics = step_fn(state, batch)
        jax.block_until_ready(metrics)
        windows = []
        for _ in range(5):
            t0 = time.perf_counter()
            for _ in range(iters):
                state, metrics = step_fn(state, batch)
            jax.block_until_ready(metrics)
            windows.append((time.perf_counter() - t0) / iters * 1e3)
        out["best_ms"] = round(min(windows), 2)
        out["median_ms"] = round(sorted(windows)[len(windows) // 2], 2)
        out["d_loss"] = float(metrics["d_loss"])
        out["g_loss"] = float(metrics["g_loss"])
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--time", action="store_true")
    ap.add_argument("--variants", type=str, default="base,remat")
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()
    for name in args.variants.split(","):
        try:
            print(json.dumps(probe(name, VARIANTS[name], args.time, args.iters)), flush=True)
        except Exception as e:  # keep probing other variants
            print(json.dumps({"variant": name, "error": repr(e)[:200]}), flush=True)


if __name__ == "__main__":
    main()
