"""CLI — mirrors the reference's ``main.py`` flag-for-flag.

ref ``parse_args()`` (main.py:~10-70) / ``check_args()`` (:~72-85) /
``main()`` (:~88-110). The reference selects ``BigGAN_128/256/512`` by
``--img_size``; here one parameterized :class:`~biggan_tpu.models.biggan.BigGAN`
covers 32–512. Extra TPU-native flags are grouped at the bottom; presets
from :mod:`biggan_tpu.configs` are reachable via ``--config``.
"""

from __future__ import annotations

import argparse
import dataclasses
import sys

from biggan_tpu.configs.base import GANConfig, get_config, list_configs
from biggan_tpu.utils.misc import str2bool


def parse_args(argv=None) -> GANConfig:
    desc = "TPU-native BigGAN (capabilities of BigGAN-Tensorflow)"
    parser = argparse.ArgumentParser(description=desc)
    parser.add_argument("--config", type=str, default=None,
                        help=f"preset config: {', '.join(list_configs())}")

    # reference flags (main.py:~10-70)
    parser.add_argument("--phase", type=str, default="train",
                        choices=["train", "test", "eval", "sweep"])
    parser.add_argument("--eval_num", type=int, default=None,
                        help="samples per side for --phase eval FID/IS")
    parser.add_argument("--dataset", type=str, default=None,
                        help="dataset name under --data_root, or 'synthetic'")
    parser.add_argument("--data_root", type=str, default=None,
                        help="parent dir of datasets (default ./dataset, ref layout)")
    parser.add_argument("--epoch", type=int, default=None)
    parser.add_argument("--iteration", type=int, default=None, help="iterations per epoch")
    parser.add_argument("--batch_size", type=int, default=None, help="global batch size")
    parser.add_argument("--ch", type=int, default=None, help="base channel width")
    parser.add_argument("--z_dim", type=int, default=None)
    parser.add_argument("--img_size", type=int, default=None, choices=[32, 64, 128, 256, 512])
    parser.add_argument("--sn", type=str2bool, default=None, help="spectral norm")
    parser.add_argument("--d_norm", type=str2bool, default=None,
                        help="BN inside D (ref-faithful default True; False = "
                             "the paper's SN-only D, as biggan128_v5e_fast)")
    parser.add_argument("--gan_type", type=str, default=None,
                        choices=["hinge", "gan", "lsgan", "wgan-gp", "wgan-lp", "dragan"])
    parser.add_argument("--g_lr", type=float, default=None)
    parser.add_argument("--d_lr", type=float, default=None)
    parser.add_argument("--beta1", type=float, default=None)
    parser.add_argument("--beta2", type=float, default=None)
    parser.add_argument("--moving_decay", type=float, default=None, help="EMA decay")
    parser.add_argument("--n_critic", type=int, default=None)
    parser.add_argument("--print_freq", type=int, default=None)
    parser.add_argument("--save_freq", type=int, default=None)
    parser.add_argument("--sample_num", type=int, default=None)
    parser.add_argument("--test_num", type=int, default=None)
    parser.add_argument("--allow_untrained", type=str2bool, default=None,
                        help="let --phase eval/sweep run from random-init "
                             "weights when no checkpoint restores")
    parser.add_argument("--checkpoint_dir", type=str, default=None)
    parser.add_argument("--result_dir", type=str, default=None)
    parser.add_argument("--log_dir", type=str, default=None)
    parser.add_argument("--sample_dir", type=str, default=None)

    # capabilities beyond the reference
    parser.add_argument("--num_classes", type=int, default=None,
                        help="0 = unconditional (ref behavior)")
    parser.add_argument("--grad_accum", type=int, default=None)
    parser.add_argument("--truncation_psi", type=float, default=None)
    parser.add_argument("--ortho_reg", type=float, default=None)
    parser.add_argument("--g_up_mode", type=str, default=None, choices=["deconv", "nn_conv"])
    parser.add_argument("--data_sampling", type=str, default=None,
                        choices=["shuffle", "iid"],
                        help="shuffle = full epochs w/ resume (ref); iid = with replacement")
    parser.add_argument("--data_loader", type=str, default=None,
                        choices=["auto", "ordered"],
                        help="auto = threaded/native pool (ordered forced under "
                             "multi-host); ordered = deterministic position-"
                             "based loader (exact-order resume)")

    # TPU-native
    parser.add_argument("--compute_dtype", type=str, default=None,
                        choices=["bfloat16", "float32"])
    parser.add_argument("--attn_impl", type=str, default=None,
                        choices=["auto", "xla", "pallas"])
    parser.add_argument("--sn_impl", type=str, default=None,
                        choices=["auto", "xla", "pallas"])
    parser.add_argument("--conv_impl", type=str, default=None,
                        choices=["auto", "xla", "pallas"])
    parser.add_argument("--attn_score_dtype", type=str, default=None,
                        choices=["float32", "bfloat16"],
                        help="Pallas attention score-tile dtype; bfloat16 "
                             "is a labeled numerics deviation")
    parser.add_argument("--remat", type=str2bool, default=None)
    parser.add_argument("--materialize_weights", type=str2bool, default=None,
                        help="materialize bf16-cast kernels in HBM (halves the "
                             "per-application f32 weight stream)")
    parser.add_argument("--fused_gd", type=str2bool, default=None,
                        help="share one G forward between D and G updates "
                             "(simultaneous-style update; saves HBM traffic)")
    parser.add_argument("--profile_steps", type=int, default=None,
                        help=">0: capture a jax.profiler trace of N train steps")
    parser.add_argument("--tf_import", type=str, default=None,
                        help="path to a reference BigGAN-Tensorflow checkpoint "
                             "to import into the model at startup")
    parser.add_argument("--shard_params", type=str2bool, default=None,
                        help="tensor-parallel: shard big kernels (+their "
                             "EMA/Adam slots) over the mesh 'model' axis")
    parser.add_argument("--tp_min_shard_size", type=int, default=None,
                        help="smallest output-feature width --shard_params "
                             "shards; smaller kernels stay replicated")
    parser.add_argument("--mesh_shape", type=str, default=None,
                        help="comma-separated (data,model) mesh dims; -1 "
                             "absorbs the remaining devices. A leading -1 "
                             "needs the '=' form (argparse would read a "
                             "bare '-1,1' as a flag): --mesh_shape=-1,1 "
                             "(all-data-parallel) or --mesh_shape 16,2")
    parser.add_argument("--num_slices", type=int, default=None,
                        help=">1: hybrid DCN x ICI mesh; leading data dim "
                             "spans pod slices over DCN (BASELINE config 5)")
    parser.add_argument("--norm_bwd", type=str, default=None,
                        choices=["ref", "pinned"],
                        help="train-mode BN backward: plain autodiff (ref, "
                             "default) or pinned-residual custom VJP")
    parser.add_argument("--log_sigma", type=str2bool, default=None,
                        help="log per-layer spectral-norm sigma at print_freq")
    parser.add_argument("--debug_nans", type=str2bool, default=None,
                        help="enable jax_debug_nans (dev/debug runs)")
    parser.add_argument("--seed", type=int, default=None)

    args = parser.parse_args(argv)
    base = get_config(args.config) if args.config else GANConfig()
    field_names = {f.name for f in dataclasses.fields(GANConfig)}
    overrides = {
        k: v for k, v in vars(args).items() if k in field_names and v is not None
    }
    if args.mesh_shape is not None:
        overrides["mesh_shape"] = tuple(int(x) for x in args.mesh_shape.split(","))
    return base.replace(**overrides)


def main(argv=None) -> int:
    cfg = parse_args(argv)
    from biggan_tpu.models.biggan import BigGAN
    from biggan_tpu.parallel.mesh import maybe_init_distributed

    maybe_init_distributed()
    gan = BigGAN(cfg)
    gan.build_model()  # ref main(): build_model → show_all_variables → phase dispatch
    if cfg.tf_import:
        gan.load_tf_checkpoint(cfg.tf_import)
    if cfg.phase == "train":
        gan.train()
        print(" [*] Training finished!")
    elif cfg.phase == "sweep":
        gan.truncation_sweep()
        print(" [*] Truncation sweep finished!")
    elif cfg.phase == "eval":
        metrics = gan.evaluate()
        for k, v in metrics.items():
            print(f" [*] {k}: {v}")
        print(" [*] Eval finished!")
    else:
        gan.test()
        print(" [*] Test finished!")
    return 0


if __name__ == "__main__":
    sys.exit(main())
