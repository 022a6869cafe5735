"""Golden end-to-end parity vs a reconstructed reference TF graph.

The north star's hardest clause: reference checkpoints import into the JAX
pytree with **every leaf matched by name** (no shape-fallback guessing),
and the imported weights reproduce the reference's forward activations
element-wise. ``tests/tf_ref.py`` reconstructs ref ``ops.py`` +
``BigGAN_128.generator/discriminator`` in ``tf.compat.v1`` with the
upstream variable scopes (SURVEY §2.2/§3.3); this test saves a checkpoint
from it and drives ``biggan_tpu.checkpoint.tf_import`` end to end at
128 px (reduced ``ch`` for speed — the scope/shape structure is identical
at any width).
"""

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from biggan_tpu.checkpoint.tf_import import import_tf_checkpoint  # noqa: E402
from biggan_tpu.configs.base import GANConfig  # noqa: E402
from biggan_tpu.training.train_state import build_models, create_train_state  # noqa: E402

IMG, CH, Z_DIM, BATCH = 128, 8, 120, 2


@pytest.fixture(scope="module")
def golden(tmp_path_factory):
    from tests.tf_ref import build_and_save

    path = tmp_path_factory.mktemp("tf_ckpt") / "BigGAN.model"
    z, x, g_out, d_real, d_fake, ckpt, g_train, d_real_train = build_and_save(
        str(path), img_size=IMG, ch=CH, z_dim=Z_DIM, batch=BATCH
    )

    cfg = GANConfig(
        img_size=IMG, ch=CH, z_dim=Z_DIM, sn=True, num_classes=0,
        batch_size=BATCH, compute_dtype="float32",
        attn_impl="xla", sn_impl="xla", g_up_mode="deconv", d_norm=True,
    )
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    new_state, report = import_tf_checkpoint(ckpt, state, strict=True, img_size=IMG)
    return cfg, new_state, report, z, x, g_out, d_real, d_fake, g_train, d_real_train


@pytest.mark.slow
def test_strict_import_all_by_name(golden):
    """strict=True passed (fixture built) — additionally: stage 2 unused,
    every checkpoint variable consumed, every pytree leaf filled."""
    _, _, report, *_ = golden
    assert report.shape_matched == {}, (
        f"stage-2 shape fallback used for: {list(report.shape_matched)[:10]}"
    )
    assert report.unmatched_tf == []
    assert report.unmatched_tree == []
    assert report.ambiguous == []


@pytest.mark.slow
def test_generator_forward_matches_tf(golden):
    cfg, state, _, z, _, g_out, *_ = golden
    generator, _ = build_models(cfg)
    fake = generator.apply(
        {"params": state.g_params, **state.g_state}, jnp.asarray(z), None, train=False
    )
    np.testing.assert_allclose(np.asarray(fake), g_out, atol=1e-4, rtol=1e-4)


@pytest.mark.slow
def test_discriminator_forward_matches_tf(golden):
    cfg, state, _, _, x, _, d_real, d_fake, _, _ = golden
    generator, discriminator = build_models(cfg)
    logits = discriminator.apply(
        {"params": state.d_params, **state.d_state}, jnp.asarray(x), None, train=False
    )
    np.testing.assert_allclose(np.asarray(logits), d_real, atol=1e-4, rtol=1e-4)

    # full chain: D(G(z)) — the composition the GAN actually trains through
    z = jnp.asarray(golden[3])
    fake = generator.apply(
        {"params": state.g_params, **state.g_state}, z, None, train=False
    )
    chain = discriminator.apply(
        {"params": state.d_params, **state.d_state}, fake, None, train=False
    )
    np.testing.assert_allclose(np.asarray(chain), d_fake, atol=1e-3, rtol=1e-3)


@pytest.mark.slow
def test_train_mode_forward_matches_tf(golden):
    """Train-mode parity: batch-moment cBN/BN normalization and the
    power-iteration σ must match TF's training graph element-wise (the
    path every gradient flows through)."""
    cfg, state, _, z, x, *_, g_train, d_real_train = golden
    generator, discriminator = build_models(cfg)
    fake, _ = generator.apply(
        {"params": state.g_params, **state.g_state}, jnp.asarray(z), None,
        train=True, mutable=["batch_stats", "sn_u"],
    )
    np.testing.assert_allclose(np.asarray(fake), g_train, atol=1e-4, rtol=1e-4)
    logits, _ = discriminator.apply(
        {"params": state.d_params, **state.d_state}, jnp.asarray(x), None,
        train=True, mutable=["batch_stats", "sn_u"],
    )
    np.testing.assert_allclose(np.asarray(logits), d_real_train, atol=1e-4, rtol=1e-4)


@pytest.mark.slow
def test_256px_strict_import_and_forward_parity(tmp_path):
    """BigGAN-256: the ref stack repeats mult-8 blocks, so its TF graph
    relies on scope auto-uniquify (``resblock_up_8`` / ``resblock_up_8_1``)
    — the uniquify-aware name rules must still match every leaf by name
    and reproduce the forward (ref ``BigGAN_256.py`` per SURVEY §2.1)."""
    from tests.tf_ref import build_and_save

    img, ch, z_dim, batch = 256, 4, 140, 1
    path = tmp_path / "BigGAN256.model"
    z, x, g_out, d_real, _, ckpt, _, _ = build_and_save(
        str(path), img_size=img, ch=ch, z_dim=z_dim, batch=batch
    )
    cfg = GANConfig(
        img_size=img, ch=ch, z_dim=z_dim, sn=True, num_classes=0,
        batch_size=batch, compute_dtype="float32",
        attn_impl="xla", sn_impl="xla", g_up_mode="deconv", d_norm=True,
    )
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    new_state, report = import_tf_checkpoint(ckpt, state, strict=True, img_size=img)
    assert report.shape_matched == {} and report.unmatched_tf == []

    generator, discriminator = build_models(cfg)
    fake = generator.apply(
        {"params": new_state.g_params, **new_state.g_state},
        jnp.asarray(z), None, train=False,
    )
    np.testing.assert_allclose(np.asarray(fake), g_out, atol=1e-4, rtol=1e-4)
    logits = discriminator.apply(
        {"params": new_state.d_params, **new_state.d_state},
        jnp.asarray(x), None, train=False,
    )
    np.testing.assert_allclose(np.asarray(logits), d_real, atol=1e-4, rtol=1e-4)


@pytest.mark.slow
def test_512px_strict_import(tmp_path):
    """BigGAN-512 (ref ``BigGAN_512.py``): duplicate multipliers in BOTH
    stacks (G: 8,8 and 1,1; D: 1,1 and 8,8) — strict name-complete import
    through every uniquified scope, plus G forward parity."""
    from tests.tf_ref import build_and_save

    img, ch, z_dim, batch = 512, 2, 160, 1
    path = tmp_path / "BigGAN512.model"
    z, x, g_out, *_ , ckpt, _, _ = build_and_save(
        str(path), img_size=img, ch=ch, z_dim=z_dim, batch=batch
    )
    cfg = GANConfig(
        img_size=img, ch=ch, z_dim=z_dim, sn=True, num_classes=0,
        batch_size=batch, compute_dtype="float32",
        attn_impl="xla", sn_impl="xla", g_up_mode="deconv", d_norm=True,
    )
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    new_state, report = import_tf_checkpoint(ckpt, state, strict=True, img_size=img)
    assert report.shape_matched == {} and report.unmatched_tf == []

    generator, _ = build_models(cfg)
    fake = generator.apply(
        {"params": new_state.g_params, **new_state.g_state},
        jnp.asarray(z), None, train=False,
    )
    np.testing.assert_allclose(np.asarray(fake), g_out, atol=1e-4, rtol=1e-4)


@pytest.mark.slow
def test_ema_slots_filled_with_imported_weights(golden):
    """swapping_saver semantics: imported G weights land in raw AND EMA."""
    _, state, *_ = golden
    flat_raw = jax.tree.leaves(state.g_params)
    flat_ema = jax.tree.leaves(state.g_ema_params)
    for a, b in zip(flat_raw, flat_ema):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
