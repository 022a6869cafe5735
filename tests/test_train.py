"""Integration tests: 2-step train on synthetic data (SURVEY.md §4).

Losses finite, EMA ≠ raw params, SN u mutates, checkpoint→restore→resume
round-trips, sample grid PNG written.
"""

import os

import numpy as np
import pytest

from biggan_tpu.configs import GANConfig, get_config


def tiny_cfg(**kw):
    base = dict(
        dataset="synthetic", img_size=32, ch=8, z_dim=16, num_classes=4,
        batch_size=8, epoch=1, iteration=2, print_freq=1, save_freq=2,
        sample_num=4, test_num=1, compute_dtype="float32",
        g_lr=1e-3, d_lr=1e-3,
    )
    base.update(kw)
    return GANConfig(**base)


def make_batch(cfg, seed=0):
    rng = np.random.RandomState(seed)
    batch = {
        "image": rng.randint(
            0, 256, (cfg.n_critic, cfg.batch_size, cfg.img_size, cfg.img_size, 3)
        ).astype(np.uint8),
    }
    if cfg.num_classes > 0:
        batch["label"] = rng.randint(0, cfg.num_classes, (cfg.n_critic, cfg.batch_size)).astype(np.int32)
    return batch


def run_steps(cfg, n=2):
    import jax

    from biggan_tpu.training.train_state import create_train_state
    from biggan_tpu.training.train_step import make_train_step

    state = create_train_state(cfg, jax.random.PRNGKey(0))
    step_fn = jax.jit(make_train_step(cfg))
    metrics = None
    for i in range(n):
        state, metrics = step_fn(state, make_batch(cfg, seed=i))
    return state, metrics


def test_two_step_train_state_evolution():
    import jax

    cfg = tiny_cfg()
    state0 = None
    from biggan_tpu.training.train_state import create_train_state

    state0 = create_train_state(cfg, jax.random.PRNGKey(0))
    state, metrics = run_steps(cfg, n=2)

    assert int(state.step) == 2
    for k in ("d_loss", "g_loss", "d_grad_norm", "g_grad_norm"):
        assert np.isfinite(float(metrics[k])), (k, metrics[k])

    # EMA diverged from raw params (they started equal)
    diffs = jax.tree.map(
        lambda e, p: float(np.abs(np.asarray(e) - np.asarray(p)).max()),
        state.g_ema_params, state.g_params,
    )
    assert max(jax.tree.leaves(diffs)) > 0.0

    # SN u actually mutated during training
    u0 = jax.tree.leaves(state0.g_state["sn_u"])[0]
    u1 = jax.tree.leaves(state.g_state["sn_u"])[0]
    assert not np.allclose(np.asarray(u0), np.asarray(u1))

    # BN pop stats moved off their init
    bn_means = [np.asarray(x) for x in jax.tree.leaves(state.d_state["batch_stats"])]
    assert any(np.abs(m).max() > 0 for m in bn_means)


@pytest.mark.parametrize(
    "gan_type",
    ["hinge", "wgan-gp", "gan",
     pytest.param("lsgan", marks=pytest.mark.slow),
     pytest.param("dragan", marks=pytest.mark.slow),
     pytest.param("wgan-lp", marks=pytest.mark.slow)],
)
def test_gan_types_train(gan_type):
    cfg = tiny_cfg(gan_type=gan_type)
    _, metrics = run_steps(cfg, n=1)
    assert np.isfinite(float(metrics["d_loss"]))
    assert np.isfinite(float(metrics["g_loss"]))


@pytest.mark.slow
def test_n_critic_and_grad_accum():
    cfg = tiny_cfg(n_critic=2, grad_accum=2)
    state, metrics = run_steps(cfg, n=1)
    assert int(state.step) == 1
    assert np.isfinite(float(metrics["d_loss"]))


def test_unconditional_mode():
    cfg = tiny_cfg(num_classes=0)
    _, metrics = run_steps(cfg, n=1)
    assert np.isfinite(float(metrics["g_loss"]))


@pytest.mark.slow
def test_facade_train_test_checkpoint_roundtrip(tmp_path, monkeypatch):
    """The reference workflow: build → train → save → fresh object → test."""
    monkeypatch.chdir(tmp_path)
    from biggan_tpu.models.biggan import BigGAN

    cfg = tiny_cfg()
    gan = BigGAN(cfg)
    gan.build_model()
    gan.train()

    assert (tmp_path / "samples").exists()
    pngs = list((tmp_path / "samples").glob("*.png"))
    assert pngs, "no train sample grids written"
    assert (tmp_path / "logs" / cfg.model_dir / "config.json").exists()
    assert (tmp_path / "logs" / cfg.model_dir / "metrics.jsonl").exists()

    # fresh object restores the checkpoint and resumes at the saved step
    gan2 = BigGAN(cfg)
    gan2.build_model()
    assert gan2.load(), "checkpoint restore failed"
    assert int(gan2.state.step) == cfg.epoch * cfg.iteration
    np.testing.assert_allclose(
        np.asarray(gan2.state.g_ema_params["fc_seed"]["kernel"]),
        np.asarray(gan.state.g_ema_params["fc_seed"]["kernel"]),
    )

    gan2.test()
    results = list((tmp_path / "results" / cfg.model_dir).glob("*.png"))
    assert len(results) == cfg.test_num


def test_sample_shapes_and_range(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from biggan_tpu.models.biggan import BigGAN

    cfg = tiny_cfg()
    gan = BigGAN(cfg)
    gan.build_model()
    import jax

    imgs = gan.sample(4, psi=0.5, rng=jax.random.PRNGKey(0))
    assert imgs.shape == (4, 32, 32, 3)
    assert imgs.min() >= -1.0 and imgs.max() <= 1.0


def test_preset_configs_valid():
    for name in ("biggan32_cifar10", "biggan64_imagenet", "biggan128_paper",
                 "biggan256_ici", "biggan512_pod", "biggan128_v5e_fast"):
        cfg = get_config(name)
        assert cfg.img_size in (32, 64, 128, 256, 512)


def test_v5e_fast_preset_is_the_measured_deviation():
    """The labeled deviation preset ships exactly the measured-winning
    shape (docs/bench/r4/dev_ch48.jsonl): half-width channels + the
    paper's SN-only D; numerics options stay at their faithful defaults
    (bf16 score tiles measured a REGRESSION — BENCH_NOTES r4b)."""
    cfg = get_config("biggan128_v5e_fast")
    assert cfg.img_size == 128 and cfg.ch == 48
    assert cfg.d_norm is False and cfg.n_critic == 2
    assert cfg.attn_score_dtype == "float32"


def test_cli_parses_reference_flags():
    from biggan_tpu.cli import parse_args

    cfg = parse_args([
        "--phase", "train", "--dataset", "synthetic", "--img_size", "64",
        "--ch", "32", "--z_dim", "80", "--sn", "True", "--gan_type", "hinge",
        "--batch_size", "16", "--epoch", "2", "--iteration", "5",
    ])
    assert cfg.img_size == 64 and cfg.ch == 32 and cfg.z_dim == 80
    assert cfg.sn is True and cfg.batch_size == 16

    cfg = parse_args(["--config", "biggan128_paper", "--batch_size", "8"])
    assert cfg.img_size == 128 and cfg.batch_size == 8

    cfg = parse_args(["--phase", "train", "--d_norm", "False"])
    assert cfg.d_norm is False
    cfg = parse_args(["--config", "biggan128_v5e_fast"])
    assert cfg.d_norm is False and cfg.ch == 48


@pytest.mark.slow
def test_remat_parity_and_training():
    """remat=True must give identical forward results and a working
    train step (it only changes what's recomputed in backward)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from biggan_tpu.configs import GANConfig
    from biggan_tpu.training.train_state import build_models, create_train_state
    from biggan_tpu.training.train_step import make_train_step

    kw = dict(
        dataset="synthetic", img_size=32, ch=8, z_dim=16, num_classes=4,
        batch_size=4, compute_dtype="float32",
    )
    cfg = GANConfig(**kw)
    cfg_r = GANConfig(**kw, remat=True)

    gen, _ = build_models(cfg)
    gen_r, _ = build_models(cfg_r)
    z = jax.random.normal(jax.random.PRNGKey(0), (4, 16))
    labels = jnp.zeros((4,), jnp.int32)
    v = gen.init(jax.random.PRNGKey(1), z, labels, train=False)
    out = gen.apply(v, z, labels, train=False)
    out_r = gen_r.apply(v, z, labels, train=False)  # same params work
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_r), atol=1e-6)

    state = create_train_state(cfg_r, jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    batch = {
        "image": rng.randint(0, 256, (1, 4, 32, 32, 3)).astype(np.uint8),
        "label": rng.randint(0, 4, (1, 4)).astype(np.int32),
    }
    new_state, metrics = jax.jit(make_train_step(cfg_r))(state, batch)
    assert np.isfinite(float(metrics["d_loss"]))
    assert np.isfinite(float(metrics["g_loss"]))


def test_device_prefetch_overlap():
    """device_prefetch yields device-resident batches in order."""
    import jax
    import numpy as np

    from biggan_tpu.data.pipeline import device_prefetch
    from biggan_tpu.parallel.mesh import create_mesh
    from biggan_tpu.parallel.sharding import batch_sharding

    mesh = create_mesh((8, 1), ("data", "model"))
    sharding = batch_sharding(mesh, batch_dim=1)
    batches = [{"image": np.full((1, 8, 4, 4, 3), i, np.uint8)} for i in range(5)]
    out = list(device_prefetch(iter(batches), sharding, depth=2))
    assert len(out) == 5
    for i, b in enumerate(out):
        assert int(jax.device_get(b["image"]).flat[0]) == i
        assert b["image"].sharding.spec == jax.sharding.PartitionSpec(None, "data")


@pytest.mark.slow
@pytest.mark.parametrize("img_size", [64, 256, 512])
def test_all_resolutions_train_step(img_size):
    """Every arch-table entry (incl. the deep 256/512 stacks with remat)
    runs a full train step at tiny width on the CPU mesh."""
    import jax
    import numpy as np

    from biggan_tpu.configs import GANConfig
    from biggan_tpu.training.train_state import create_train_state
    from biggan_tpu.training.train_step import make_train_step

    cfg = GANConfig(
        dataset="synthetic", img_size=img_size, ch=4, z_dim=20, num_classes=3,
        batch_size=2, compute_dtype="float32", remat=img_size >= 256,
    )
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    batch = {
        "image": rng.randint(0, 256, (1, 2, img_size, img_size, 3)).astype(np.uint8),
        "label": rng.randint(0, 3, (1, 2)).astype(np.int32),
    }
    new_state, metrics = jax.jit(make_train_step(cfg))(state, batch)
    assert np.isfinite(float(metrics["d_loss"]))
    assert np.isfinite(float(metrics["g_loss"]))
    assert int(new_state.step) == 1


def test_remat_with_axis_name_vmap():
    """Regression: remat static_argnums must mark (train, axis_name) — an
    off-by-one passes the string axis_name as a traced arg and crashes
    under an axis context (flax counts `self` as arg 0)."""
    import jax
    import jax.numpy as jnp

    from biggan_tpu.ops.blocks import ResBlockDown
    import flax.linen as nn

    block = nn.remat(ResBlockDown, static_argnums=(2, 3))(8, dtype=jnp.float32)
    x = jnp.ones((4, 2, 8, 8, 3))

    def fwd(xi, variables):
        return block.apply(variables, xi, True, "data", mutable=["batch_stats", "sn_u"])[0]

    variables = block.init(jax.random.PRNGKey(0), x[0], True, None)
    out = jax.vmap(fwd, in_axes=(0, None), axis_name="data")(x, variables)
    assert out.shape == (4, 2, 4, 4, 8)


@pytest.mark.slow
def test_eval_mode_does_not_mutate_state():
    """train=False must run with NO mutable collections: cBN/BN use pop
    stats and SN uses the stored u without updating (ref test head,
    BigGAN_128.py:~345). Flax raises if anything tries to mutate."""
    import jax
    import jax.numpy as jnp

    from biggan_tpu.configs import GANConfig
    from biggan_tpu.training.train_state import build_models, create_train_state

    cfg = GANConfig(
        dataset="synthetic", img_size=64, ch=8, z_dim=16, num_classes=4,
        batch_size=2, compute_dtype="float32",
    )
    gen, disc = build_models(cfg)
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    z = jnp.zeros((2, 16))
    labels = jnp.zeros((2,), jnp.int32)

    # mutable=False (the default): any attempted write raises
    imgs = gen.apply({"params": state.g_params, **state.g_state}, z, labels, train=False)
    assert imgs.shape == (2, 64, 64, 3)
    logits = disc.apply(
        {"params": state.d_params, **state.d_state}, imgs, labels, train=False
    )
    assert logits.shape == (2, 1)


def test_truncation_sweep_writes_one_grid_per_psi(tmp_path, monkeypatch):
    """ψ-sweep (SURVEY §7 step 7): same z/labels per grid, one PNG per ψ,
    and ψ actually changes the samples (z is scaled toward the modes)."""
    from PIL import Image

    from biggan_tpu.models.biggan import BigGAN

    monkeypatch.chdir(tmp_path)
    gan = BigGAN(tiny_cfg(allow_untrained=True))
    gan.build_model()
    paths = gan.truncation_sweep(psis=(0.3, 1.0), n=4)
    assert len(paths) == 2
    imgs = []
    for p in paths:
        assert os.path.exists(p)
        imgs.append(np.asarray(Image.open(p)))
    assert not np.array_equal(imgs[0], imgs[1])  # ψ moves the output


def test_sweep_and_eval_refuse_untrained_weights(tmp_path, monkeypatch):
    """eval/sweep with no checkpoint must fail loudly unless the caller
    explicitly opts in (VERDICT r4 weak #7; ref test() prints Load failed)."""
    import pytest

    from biggan_tpu.models.biggan import BigGAN

    monkeypatch.chdir(tmp_path)
    gan = BigGAN(tiny_cfg())  # allow_untrained defaults to False
    gan.build_model()
    with pytest.raises(RuntimeError, match="allow_untrained"):
        gan.truncation_sweep(psis=(1.0,), n=4)
    with pytest.raises(RuntimeError, match="allow_untrained"):
        gan.evaluate(num_samples=4)
