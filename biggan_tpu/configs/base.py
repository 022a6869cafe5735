"""Config system — dataclass configs + the five BASELINE presets.

The reference's entire config system is ``argparse`` flags in
``main.py:~10-85``, with the resolved config implicitly encoded in the
``model_dir`` path name (ref ``BigGAN_128.model_dir``, :~385-395). Here a
frozen dataclass is the single source of truth: every reference flag has a
field (same names where sensible), CLI overrides map onto it, and the
resolved config is persisted as ``config.json`` inside the run directory
(SURVEY.md §5 "Config / flag system").
"""

from __future__ import annotations

import dataclasses
import json
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class GANConfig:
    # --- phase / bookkeeping (ref main.py flags) ---
    phase: str = "train"  # train | test | eval (FID/IS) | sweep (truncation ψ)
    # samples per side for --phase eval FID/IS. 50k is the BASELINE
    # quality clause's scale (FID@50k) and the shipped default — the
    # harness streams moments, so memory stays flat (proven at 50k/50k,
    # RESULTS.md r4); lower it for quick smoke evals.
    eval_num: int = 50_000
    dataset: str = "synthetic"  # dataset name → <data_root>/<name>/*.* or "synthetic"
    data_root: str = "dataset"  # parent dir of datasets (ref hardcodes ./dataset)
    checkpoint_dir: str = "checkpoint"
    result_dir: str = "results"
    log_dir: str = "logs"
    sample_dir: str = "samples"

    # --- model (ref main.py flags) ---
    img_size: int = 128
    ch: int = 96  # base channel width (paper: 96 at 128px)
    z_dim: int = 120  # 120 → six 20-dim chunks at 128px (paper)
    sn: bool = True  # spectral norm on conv/dense
    num_classes: int = 0  # 0 = unconditional (ref behavior); >0 = cBN class embed
    embed_dim: int = 128  # shared class-embedding width
    g_up_mode: str = "deconv"  # "deconv" (ref-faithful) | "nn_conv" (paper)
    d_norm: bool = True  # BN inside D (ref keeps it; False = paper SN-only D)
    attn_impl: str = "auto"  # "auto" (pallas on TPU) | "xla" | "pallas"
    # power-iteration impl: "auto" = fused Pallas kernel on TPU (2.7× faster
    # train step, see BENCH notes), XLA elsewhere; or force "xla"/"pallas".
    sn_impl: str = "auto"
    # conv/deconv impl: "auto" = XLA everywhere (Pallas conv kernels win
    # their shapes in isolation but measured a 7% full-step REGRESSION —
    # they forfeit XLA's conv+cBN-moment epilogue fusions; BENCH_NOTES
    # r3d). "pallas" forces the kernels on their supported shape classes.
    conv_impl: str = "auto"
    # Score-tile dtype of the Pallas attention kernel. "float32" (default)
    # matches the XLA path exactly; "bfloat16" halves the VMEM bytes of
    # the VPU-bound [block_n, m] tiles — a LABELED NUMERICS DEVIATION
    # (softmax weights carry ~1e-2 relative error worst-case). Opt-in
    # only; never selected by "auto" anything — and measured SLOWER
    # in-step on v5e silicon (r4: attention 74.6 → 86.2 ms; see
    # kernels/attention_pallas.py), so it exists as the documented
    # close-out of the idea, not a recommendation.
    attn_score_dtype: str = "float32"

    # --- loss / optimization (ref main.py flags) ---
    gan_type: str = "hinge"
    g_lr: float = 5e-5  # paper 128px: G 5e-5
    d_lr: float = 2e-4  # paper 128px: D 2e-4
    beta1: float = 0.0
    beta2: float = 0.9
    moving_decay: float = 0.9999  # EMA decay for the averaged generator
    # dtype of Adam's first moment (optax mu_dtype). "bfloat16" halves the
    # mu read+write traffic of both optimizers — part of the ~50 GB/step
    # batch-independent HBM pool (BENCH_NOTES.md). First-moment precision
    # is forgiving (it's a smoothed gradient); the second moment stays f32.
    adam_mu_dtype: str = "float32"
    n_critic: int = 1  # D updates per G update (ref: 1; paper: 2)
    # Share one G forward between the D and G updates (simultaneous-style
    # GAN update: G gradient against the PRE-update D, same z as the D
    # step). Cuts one full G forward + one D forward of HBM traffic per
    # iteration — a big lever for the HBM-bound step (BENCH_NOTES.md).
    # Off by default: the reference is sequential (SURVEY §3.1).
    fused_gd: bool = False
    ortho_reg: float = 1e-4  # orthogonal regularization scale on G (0 = off)
    gp_weight: float = 10.0  # gradient-penalty weight for wgan-gp/lp, dragan

    # --- training schedule (ref main.py flags) ---
    epoch: int = 50
    iteration: int = 10000  # iterations per epoch
    batch_size: int = 64  # GLOBAL batch (sharded over the data mesh axis)
    grad_accum: int = 1  # virtual-batch multiplier for paper-scale batches
    print_freq: int = 100
    save_freq: int = 1000
    ckpt_keep_n: int = 3  # checkpoints retained by the orbax manager
    sample_num: int = 64  # images per sample grid
    test_num: int = 10  # grids written by `phase test`
    # eval/sweep from random-init weights is almost always a mistake (the
    # metrics/grids would silently describe an untrained model) — require
    # an explicit opt-in when no checkpoint restores (VERDICT r4 weak #7).
    allow_untrained: bool = False

    # --- data ---
    random_flip: bool = True  # device-side random horizontal flip (north star)
    # "shuffle" = shuffled full epochs with epoch/idx-consistent resume
    # (ref shuffle_and_repeat, BigGAN_128.py:~188-194); "iid" = draws with
    # replacement (statistically adjacent, no epoch boundaries).
    data_sampling: str = "shuffle"
    # "auto": threaded/native pool single-host, deterministic ordered
    # loader under multi-host (forced — correctness); "ordered": force the
    # position-based ordered loader single-host too (exact-order resume,
    # batch k is a pure function of (seed, k)).
    data_loader: str = "auto"

    # --- sampling ---
    truncation: float = 2.0  # truncated-normal threshold for z (ref: 2σ baked in)
    truncation_psi: float = 1.0  # ψ scaling at inference (1.0 = off)
    train_z_dist: str = "truncated"  # ref samples truncated z for training too

    # --- TPU-native ---
    compute_dtype: str = "bfloat16"  # bf16 on TPU; tests use float32
    mesh_shape: Tuple[int, ...] = (-1, 1)  # (data, model); -1 = all remaining devices
    mesh_axes: Tuple[str, ...] = ("data", "model")
    # >1: hybrid DCN×ICI mesh — the leading `data` dim spans slices over DCN
    # (BASELINE config 5, v4-32 pod slice); 1 = single-slice contiguous mesh.
    num_slices: int = 1
    shard_params: bool = False  # shard big kernels over the model axis (TP)
    # smallest output-feature width that TP shards; kernels below it stay
    # replicated (all-gather traffic beats the HBM saved). Tests/dry-runs
    # lower it to exercise TP on tiny models.
    tp_min_shard_size: int = 512
    remat: bool = False  # jax.checkpoint on blocks to trade FLOPs for HBM
    # Materialize the bf16-cast (spectrally normalized) kernels behind an
    # optimization barrier. Measured NEGATIVE at 128px (58.1→59.25 GB/step
    # b32 — the barrier adds a copy without replacing the f32 master
    # stream; NEXT.md item 2). Kept as an experimental knob; the winning
    # shape of this idea is the per-step normalized-weight-tree hoist.
    materialize_weights: bool = False
    # Train-mode BN/cBN backward: "ref" = plain autodiff (default);
    # "pinned" = pinned-residual custom VJP (ops/norm.py — recomputes the
    # f32 normalized tensor in backward instead of storing it; gated off
    # on D for double-differentiating gradient-penalty gan types).
    # Measured on-chip (XLA cost analysis, 128px bf16): byte-NEUTRAL at
    # b32 (58.04 vs 58.10 GB/step) and +1.5 GB at b256 — XLA already
    # rematerializes the normalize into the backward fusions, so the
    # custom VJP buys nothing here; kept as a tested option for shapes
    # where XLA's remat heuristics differ.
    norm_bwd: str = "ref"
    profile_steps: int = 0  # >0: capture a jax.profiler trace of N steps to logs
    tf_import: str = ""  # path to a reference TF checkpoint to import at startup
    log_sigma: bool = False  # log per-layer σ(W) estimates at print_freq
    log_grad_norms: bool = True  # include global grad norms in step metrics
    debug_nans: bool = False  # jax_debug_nans dev mode (SURVEY §5 sanitizers)
    seed: int = 0

    def __post_init__(self):
        if self.phase not in ("train", "test", "eval", "sweep"):
            raise ValueError(f"phase must be train|test|eval|sweep, got {self.phase!r}")
        if self.attn_score_dtype not in ("float32", "bfloat16"):
            raise ValueError(
                "attn_score_dtype must be float32|bfloat16, "
                f"got {self.attn_score_dtype!r}")
        if self.data_loader not in ("auto", "ordered"):
            raise ValueError(f"data_loader must be auto|ordered, got {self.data_loader!r}")
        if self.batch_size % self.grad_accum != 0:
            raise ValueError("batch_size must be divisible by grad_accum")
        if self.img_size not in (32, 64, 128, 256, 512):
            raise ValueError(f"img_size must be one of 32/64/128/256/512, got {self.img_size}")

    # ref model_dir property (BigGAN_128.py:~385): namespaces ckpts/logs/samples
    @property
    def model_dir(self) -> str:
        sn_tag = "sn" if self.sn else "nosn"
        # ch is part of the namespace (unlike the reference, where ch was
        # fixed per BigGAN_N file): one parameterized model must not mix
        # incompatible widths in a checkpoint dir.
        return (
            f"BigGAN_{self.dataset}_{self.gan_type}_{self.img_size}"
            f"_{self.z_dim}_ch{self.ch}_{sn_tag}"
        )

    @property
    def model_name(self) -> str:
        return "BigGAN"

    def replace(self, **kw) -> "GANConfig":
        return dataclasses.replace(self, **kw)

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2, sort_keys=True)

    @classmethod
    def from_json(cls, text: str) -> "GANConfig":
        d = json.loads(text)
        d["mesh_shape"] = tuple(d.get("mesh_shape", (-1, 1)))
        d["mesh_axes"] = tuple(d.get("mesh_axes", ("data", "model")))
        return cls(**d)


# ---------------------------------------------------------------------------
# The five BASELINE.json configs.
# ---------------------------------------------------------------------------

_PRESETS = {
    # 1. BigGAN-32 on CIFAR-10 (ch=64, no self-attn) — dev/CPU-friendly
    "biggan32_cifar10": GANConfig(
        dataset="cifar10", img_size=32, ch=64, z_dim=128, num_classes=10,
        g_lr=2e-4, d_lr=2e-4, batch_size=64, compute_dtype="float32",
    ),
    # 2. BigGAN-64 on ImageNet-64 with self-attention + spectral norm
    "biggan64_imagenet": GANConfig(
        dataset="imagenet64", img_size=64, ch=64, z_dim=120, num_classes=1000,
        batch_size=256,
    ),
    # 3. BigGAN-128 full paper config (cBN shared embed, z-splits, EMA, truncation)
    "biggan128_paper": GANConfig(
        dataset="imagenet", img_size=128, ch=96, z_dim=120, num_classes=1000,
        n_critic=2, batch_size=512, grad_accum=1,
    ),
    # 4. BigGAN-256 with orthogonal regularization + cross-replica BN over ICI
    "biggan256_ici": GANConfig(
        dataset="imagenet", img_size=256, ch=96, z_dim=140, num_classes=1000,
        batch_size=256, remat=True,
    ),
    # 5. BigGAN-512 data-parallel on a v4-32 pod slice (DCN axis via mesh_shape)
    "biggan512_pod": GANConfig(
        dataset="imagenet", img_size=512, ch=96, z_dim=160, num_classes=1000,
        batch_size=256, remat=True, mesh_shape=(-1, 1),
    ),
    # LABELED DEVIATION (not a BASELINE config): the ≥2,000 img/s/chip
    # north-star bar on a TPU v5e. The reference-faithful ch=96 flagship
    # is capped by the v5e MXU peak (~1,757 roofline; 867 measured r4);
    # this preset deviates on exactly two axes and clears the bar on real
    # silicon — 2,004.2 img/s measured on the device trace
    # (docs/bench/r4/dev_ch48.jsonl):
    #   * ch=48 — half the paper's channel width (smaller model);
    #   * d_norm=False — SN-only D, which is the PAPER's discriminator
    #     (BN-in-D is the reference fork's own deviation).
    # Same architecture family, losses, EMA, truncation, and data path;
    # on the north star's own TPU v4 the faithful biggan128_paper preset
    # already clears the bar by roofline (BENCH_NOTES r3).
    "biggan128_v5e_fast": GANConfig(
        dataset="imagenet", img_size=128, ch=48, z_dim=120, num_classes=1000,
        n_critic=2, batch_size=512, grad_accum=1, d_norm=False,
    ),
}


def list_configs() -> list[str]:
    return sorted(_PRESETS)


def get_config(name: str, **overrides) -> GANConfig:
    try:
        cfg = _PRESETS[name]
    except KeyError:
        raise ValueError(f"unknown config {name!r}; available: {list_configs()}") from None
    return cfg.replace(**overrides) if overrides else cfg
