"""Blocks / attention / pooling / loss unit tests (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from biggan_tpu.ops.attn import SelfAttention, attention_xla
from biggan_tpu.ops.blocks import ResBlock, ResBlockDown, ResBlockUp
from biggan_tpu.ops.layers import SNConv2D, SNConvTranspose2D, SNDense
from biggan_tpu.ops.losses import (
    discriminator_loss,
    generator_loss,
    orthogonal_regularization,
)
from biggan_tpu.ops.pooling import global_sum_pool, max_pool, up_sample


def test_conv_shapes(rng):
    x = jnp.ones((2, 16, 16, 8))
    for stride, out_hw in [(1, 16), (2, 8)]:
        m = SNConv2D(12, 3, stride, use_sn=True)
        v = m.init(rng, x)
        y = m.apply(v, x)
        assert y.shape == (2, out_hw, out_hw, 12)


def test_deconv_doubles_hw(rng):
    x = jnp.ones((2, 8, 8, 8))
    m = SNConvTranspose2D(4, 3, 2, use_sn=True)
    v = m.init(rng, x)
    assert m.apply(v, x).shape == (2, 16, 16, 4)


def test_sn_layer_constrains_sigma(rng):
    x = jax.random.normal(rng, (4, 32), jnp.float32)
    m = SNDense(16, use_sn=True)
    v = m.init(rng, x)
    # inflate the kernel; after repeated SN forward passes output scale stays bounded
    params = jax.tree.map(lambda p: p * 50.0, v["params"])
    variables = {"params": params, "sn_u": v["sn_u"]}
    for _ in range(20):
        y, mut = m.apply(variables, x, update_sn=True, mutable=["sn_u"])
        variables = {"params": params, "sn_u": mut["sn_u"]}
    w = np.asarray(params["kernel"])
    w_sn = w / np.linalg.svd(w, compute_uv=False)[0]
    expected = np.asarray(x) @ w_sn
    np.testing.assert_allclose(np.asarray(y) - np.asarray(params["bias"]) / 1.0, expected, rtol=2e-2, atol=2e-2)


def test_sn_u_mutates_only_when_training(rng):
    x = jnp.ones((2, 8))
    m = SNDense(4, use_sn=True)
    v = m.init(rng, x)
    _, mut = m.apply(v, x, update_sn=True, mutable=["sn_u"])
    assert not np.allclose(np.asarray(mut["sn_u"]["u"]), np.asarray(v["sn_u"]["u"]))
    y = m.apply(v, x, update_sn=False)  # eval: no mutable needed, u untouched
    assert y.shape == (2, 4)


def test_resblock_shapes(rng):
    x = jnp.ones((2, 8, 8, 16))
    cond = jnp.ones((2, 24))
    up = ResBlockUp(8)
    v = up.init(rng, x, cond)
    y, _ = up.apply(v, x, cond, train=True, mutable=["batch_stats", "sn_u"])
    assert y.shape == (2, 16, 16, 8)

    up_nn = ResBlockUp(8, up_mode="nn_conv")
    v = up_nn.init(rng, x, cond)
    y, _ = up_nn.apply(v, x, cond, train=True, mutable=["batch_stats", "sn_u"])
    assert y.shape == (2, 16, 16, 8)

    down = ResBlockDown(32)
    v = down.init(rng, x)
    y, _ = down.apply(v, x, train=True, mutable=["batch_stats", "sn_u"])
    assert y.shape == (2, 4, 4, 32)

    flat = ResBlock(16)
    v = flat.init(rng, x)
    y, _ = flat.apply(v, x, train=True, mutable=["batch_stats", "sn_u"])
    assert y.shape == x.shape


def test_attention_gamma_zero_is_identity(rng):
    x = jax.random.normal(rng, (2, 8, 8, 32), jnp.float32)
    attn = SelfAttention()
    v = attn.init(rng, x)
    y, _ = attn.apply(v, x, train=True, mutable=["sn_u"])
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-6)


def test_attention_xla_is_softmax_weighted_sum(rng):
    q = jax.random.normal(rng, (1, 4, 8), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(1), (1, 6, 8), jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(2), (1, 6, 16), jnp.float32)
    o = attention_xla(q, k, v)
    scores = np.einsum("bnd,bmd->bnm", np.asarray(q), np.asarray(k))
    probs = np.exp(scores - scores.max(-1, keepdims=True))
    probs /= probs.sum(-1, keepdims=True)
    np.testing.assert_allclose(np.asarray(o), probs @ np.asarray(v), rtol=1e-5, atol=1e-5)


def test_pooling(rng):
    x = jnp.arange(16, dtype=jnp.float32).reshape(1, 4, 4, 1)
    assert max_pool(x).shape == (1, 2, 2, 1)
    assert float(max_pool(x)[0, 0, 0, 0]) == 5.0
    assert global_sum_pool(x).shape == (1, 1)
    up = up_sample(x)
    assert up.shape == (1, 8, 8, 1)
    assert float(up[0, 1, 1, 0]) == float(x[0, 0, 0, 0])


@pytest.mark.parametrize("gan_type", ["hinge", "gan", "lsgan", "wgan-gp", "wgan-lp", "dragan"])
def test_losses_finite(gan_type, rng):
    real = jax.random.normal(rng, (8, 1))
    fake = jax.random.normal(jax.random.PRNGKey(1), (8, 1))
    d = discriminator_loss(gan_type, real, fake)
    g = generator_loss(gan_type, fake)
    assert np.isfinite(float(d)) and np.isfinite(float(g))


def test_hinge_loss_values():
    real = jnp.array([[2.0], [0.5]])
    fake = jnp.array([[-2.0], [0.5]])
    # relu(1-2)=0, relu(1-0.5)=0.5 → 0.25 ; relu(1-2)=0, relu(1+0.5)=1.5 → 0.75
    np.testing.assert_allclose(float(discriminator_loss("hinge", real, fake)), 0.25 + 0.75)
    np.testing.assert_allclose(float(generator_loss("hinge", fake)), 0.75)


def test_orthogonal_reg_zero_for_orthogonal_weight():
    q, _ = np.linalg.qr(np.random.RandomState(0).randn(64, 16))
    params = {"dense": {"kernel": jnp.asarray(q, jnp.float32), "bias": jnp.zeros(16)}}
    # (1−I)-masked form: orthonormal columns ⇒ zero off-diagonal Gram entries
    assert float(orthogonal_regularization(params)) < 1e-10
    params_bad = {"dense": {"kernel": jnp.ones((64, 16), jnp.float32)}}
    assert float(orthogonal_regularization(params_bad)) > 0.0


def test_orthogonal_reg_small_gram_identity():
    """The HBM-lean small-Gram form must equal the naive masked form —
    value AND gradient — for both wide (rows<cols, the seed-FC case that
    cost 12.7 GB/step) and tall kernels."""
    import jax

    def naive(params, scale=1e-4):
        total = 0.0
        for leaf in jax.tree.leaves(params):
            w = np.asarray(leaf, np.float64).reshape(-1, leaf.shape[-1])
            gram = w.T @ w
            off = gram * (1.0 - np.eye(gram.shape[0]))
            total += np.sum(off**2)
        return scale * total

    rng = np.random.RandomState(7)
    for shape in [(8, 200), (200, 8), (3, 3, 12, 6)]:
        params = {"m": {"kernel": jnp.asarray(rng.randn(*shape), jnp.float32)}}
        got = float(orthogonal_regularization(params))
        want = naive(params)
        np.testing.assert_allclose(got, want, rtol=1e-4)
        # gradient check against the naive jax form
        def naive_jax(p):
            total = 0.0
            for leaf in jax.tree.leaves(p):
                w = leaf.reshape(-1, leaf.shape[-1])
                gram = w.T @ w
                off = gram * (1.0 - jnp.eye(gram.shape[0]))
                total = total + jnp.sum(off**2)
            return 1e-4 * total

        g1 = jax.grad(lambda p: orthogonal_regularization(p))(params)
        g2 = jax.grad(naive_jax)(params)
        np.testing.assert_allclose(
            np.asarray(g1["m"]["kernel"]), np.asarray(g2["m"]["kernel"]),
            atol=1e-6, rtol=1e-4,
        )


def test_activations_contract():
    """relu/lrelu/tanh — the reference ops vocabulary (ref ops.py:~345-355)."""
    from biggan_tpu.ops import lrelu, relu, tanh

    x = jnp.array([-2.0, -0.5, 0.0, 1.5])
    np.testing.assert_allclose(relu(x), [0.0, 0.0, 0.0, 1.5])
    np.testing.assert_allclose(lrelu(x), [-0.4, -0.1, 0.0, 1.5], atol=1e-7)
    np.testing.assert_allclose(lrelu(x, alpha=0.1), [-0.2, -0.05, 0.0, 1.5], atol=1e-7)
    np.testing.assert_allclose(tanh(x), np.tanh(x), atol=1e-6)


def test_fused_qkv_matches_separate_projections():
    """The concatenated q/k/v projection matmul must be numerically
    equivalent to three separate 1x1 convs — same params (identical tree
    layout), same output, for both attention variants."""
    rng = jax.random.PRNGKey(11)
    x = jax.random.normal(rng, (2, 8, 8, 16), jnp.float32)
    for pooled in (True, False):
        fused = SelfAttention(pooled_kv=pooled, fused_qkv=True, impl="xla")
        plain = SelfAttention(pooled_kv=pooled, fused_qkv=False, impl="xla")
        vars_f = fused.init(jax.random.PRNGKey(1), x)
        vars_p = plain.init(jax.random.PRNGKey(1), x)
        # identical parameter trees (checkpoint compatibility)
        assert jax.tree.structure(vars_f["params"]) == jax.tree.structure(vars_p["params"])
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
            vars_f["params"], vars_p["params"],
        )
        y_f, mut_f = fused.apply(vars_f, x, train=True, mutable=["sn_u"])
        y_p, mut_p = plain.apply(vars_p, x, train=True, mutable=["sn_u"])
        np.testing.assert_allclose(np.asarray(y_f), np.asarray(y_p), atol=1e-5)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6),
            mut_f["sn_u"], mut_p["sn_u"],
        )
