"""fused_gd train-step variant: one shared G forward for both updates.

Validates the stop-gradient placement exactly: the joint loss's gradient
w.r.t. d_params must equal the D-only loss gradient, and w.r.t. g_params
the G-only loss gradient — i.e. no leakage either way.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from biggan_tpu.configs import GANConfig
from biggan_tpu.ops.losses import discriminator_loss, generator_loss
from biggan_tpu.training.train_state import build_models, create_train_state
from biggan_tpu.training.train_step import make_train_step

_MUT = ["batch_stats", "sn_u"]


def _cfg(**kw):
    base = dict(
        dataset="synthetic", img_size=32, ch=8, z_dim=16, num_classes=0,
        batch_size=8, compute_dtype="float32", random_flip=False,
        fused_gd=True, ortho_reg=0.0,
    )
    base.update(kw)
    return GANConfig(**base)


def test_fused_gd_requires_single_critic():
    with pytest.raises(ValueError, match="n_critic"):
        make_train_step(_cfg(n_critic=2))


@pytest.mark.slow
def test_fused_gd_two_steps_evolve():
    cfg = _cfg()
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    step = jax.jit(make_train_step(cfg))
    rng = np.random.RandomState(0)
    for _ in range(2):
        batch = {
            "image": rng.rand(1, cfg.batch_size, 32, 32, 3).astype(np.float32) * 2 - 1
        }
        state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["d_loss"]))
    assert np.isfinite(float(metrics["g_loss"]))
    # EMA departed from raw params
    diffs = jax.tree.map(
        lambda a, b: float(np.abs(np.asarray(a - b)).max()),
        state.g_params, state.g_ema_params,
    )
    assert max(jax.tree.leaves(diffs)) > 0


@pytest.mark.slow
def test_fused_gradients_split_exactly(monkeypatch):
    """Fused-step grads == grads of the separately-computed D/G losses."""
    cfg = _cfg(g_lr=1.0, d_lr=1.0, moving_decay=0.0)  # SGD-visible updates
    state = create_train_state(cfg, jax.random.PRNGKey(1))
    generator, discriminator = build_models(cfg)

    # pin z so the reference computation sees the identical batch
    z_fixed = jax.random.normal(jax.random.PRNGKey(42), (cfg.batch_size, cfg.z_dim))
    import biggan_tpu.training.train_step as ts
    monkeypatch.setattr(ts, "sample_z", lambda rng, shape, *a, **k: z_fixed)

    real = (
        np.random.RandomState(3).rand(1, cfg.batch_size, 32, 32, 3).astype(np.float32)
        * 2 - 1
    )
    batch = {"image": real}

    step = make_train_step(cfg)  # fused (cfg.fused_gd)
    new_state, _ = step(state, batch)
    # recover the applied updates: adam(lr=1) — instead compare via grads:
    # rebuild reference grads and push through the same optimizer.
    import optax
    from biggan_tpu.training.train_state import build_optimizers

    def gen_fwd(g_params, g_state, z):
        return generator.apply(
            {"params": g_params, **g_state}, z, None, train=True, mutable=_MUT
        )

    def disc_fwd(d_params, d_state, x):
        return discriminator.apply(
            {"params": d_params, **d_state}, x, None, train=True, mutable=_MUT
        )

    real0 = jnp.asarray(real[0])

    def d_only_loss(d_params):
        fake, _ = gen_fwd(state.g_params, state.g_state, z_fixed)
        fake = jax.lax.stop_gradient(fake)
        rl, d_mut = disc_fwd(d_params, state.d_state, real0)
        fl, _ = disc_fwd(d_params, d_mut, fake)
        return discriminator_loss(cfg.gan_type, rl, fl)

    def g_only_loss(g_params):
        fake, _ = gen_fwd(g_params, state.g_state, z_fixed)
        _, d_mut = disc_fwd(state.d_params, state.d_state, real0)
        fl, _ = disc_fwd(state.d_params, d_mut, fake)
        return generator_loss(cfg.gan_type, fl)

    d_grads = jax.grad(d_only_loss)(state.d_params)
    g_grads = jax.grad(g_only_loss)(state.g_params)

    g_opt, d_opt = build_optimizers(cfg)
    d_up, _ = d_opt.update(d_grads, state.d_opt_state, state.d_params)
    expect_d = optax.apply_updates(state.d_params, d_up)
    g_up, _ = g_opt.update(g_grads, state.g_opt_state, state.g_params)
    expect_g = optax.apply_updates(state.g_params, g_up)

    for got, want in ((new_state.d_params, expect_d), (new_state.g_params, expect_g)):
        for a, b in zip(jax.tree.leaves(got), jax.tree.leaves(want)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


@pytest.mark.slow
def test_fused_gd_gradient_penalty_path():
    """fused_gd with a GP gan_type: the penalty's extra D application
    composes with the shared-forward joint loss."""
    cfg = _cfg(gan_type="wgan-gp")
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    step = jax.jit(make_train_step(cfg))
    batch = {
        "image": np.random.RandomState(0).rand(1, cfg.batch_size, 32, 32, 3).astype(np.float32) * 2 - 1
    }
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["d_loss"]))
    assert np.isfinite(float(metrics["g_loss"]))
