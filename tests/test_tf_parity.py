"""Golden parity tests vs TF 2.21 CPU (SURVEY.md §4, §7 "Hard parts").

The reference is TF1.x; the ops whose semantics can silently diverge are
conv padding, ``conv2d_transpose`` output placement, batch-norm eps/decay,
and truncated-normal statistics. Each test builds the same computation in
TF and in this framework and compares element-wise.
"""

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from biggan_tpu.ops.layers import SNConv2D, SNConvTranspose2D  # noqa: E402


def _init_apply(module, x):
    vars_ = module.init(jax.random.PRNGKey(0), x)
    return vars_, module.apply(vars_, x)


class TestConvParity:
    @pytest.mark.parametrize("stride", [1, 2])
    def test_conv_same_as_manual_pad_valid(self, stride):
        """Reference conv: symmetric zero-pad (k-1)//2 then VALID
        (ref ops.py:~40-75). Must equal our SNConv2D exactly."""
        rng = np.random.RandomState(0)
        x = rng.randn(2, 8, 8, 3).astype(np.float32)
        w = rng.randn(3, 3, 3, 5).astype(np.float32)

        tf_x = tf.constant(np.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0))))
        tf_y = tf.nn.conv2d(tf_x, tf.constant(w), strides=stride, padding="VALID").numpy()

        mod = SNConv2D(5, 3, stride, use_bias=False)
        y = mod.apply({"params": {"kernel": jnp.asarray(w)}}, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(y), tf_y, rtol=1e-5, atol=1e-5)

    @pytest.mark.parametrize("in_hw,stride", [(4, 2), (8, 2)])
    def test_conv_transpose_matches_tf(self, in_hw, stride):
        """G's upsampler must match tf.nn.conv2d_transpose(SAME, s2)
        (ref ``deconv``, ops.py:~78-110) — output placement and edge rows
        are where JAX/TF can disagree."""
        rng = np.random.RandomState(1)
        cin, cout = 3, 4
        x = rng.randn(2, in_hw, in_hw, cin).astype(np.float32)
        w_hwio = rng.randn(3, 3, cin, cout).astype(np.float32)

        # TF conv2d_transpose expects [H, W, out, in]
        w_tf = np.transpose(w_hwio, (0, 1, 3, 2))
        tf_y = tf.nn.conv2d_transpose(
            tf.constant(x),
            tf.constant(w_tf),
            output_shape=[2, in_hw * stride, in_hw * stride, cout],
            strides=stride,
            padding="SAME",
        ).numpy()

        mod = SNConvTranspose2D(cout, 3, stride, use_bias=False)
        y = mod.apply({"params": {"kernel": jnp.asarray(w_hwio)}}, jnp.asarray(x))
        assert y.shape == tf_y.shape
        np.testing.assert_allclose(np.asarray(y), tf_y, rtol=1e-4, atol=1e-5)


class TestBatchNormParity:
    def test_normalization_matches_tf_fused_bn(self):
        """decay=0.9, eps=1e-5 (ref ops.py:~358-365)."""
        from biggan_tpu.ops.norm import BatchNorm

        rng = np.random.RandomState(2)
        x = rng.randn(8, 4, 4, 6).astype(np.float32)
        tf_y, _, _ = tf.compat.v1.nn.fused_batch_norm(
            tf.constant(x),
            scale=tf.ones([6]),
            offset=tf.zeros([6]),
            epsilon=1e-5,
            is_training=True,
        )
        mod = BatchNorm()
        vars_ = mod.init(jax.random.PRNGKey(0), jnp.asarray(x), use_running_average=False)
        y, _ = mod.apply(
            vars_, jnp.asarray(x), use_running_average=False, mutable=["batch_stats"]
        )
        np.testing.assert_allclose(np.asarray(y), tf_y.numpy(), rtol=1e-4, atol=1e-4)


class TestTruncatedNormalParity:
    def test_moments_match_tf(self):
        """tf.random.truncated_normal resamples beyond 2σ; our jax draw
        must have the same mean/std/support."""
        from biggan_tpu.sampling.truncation import sample_z

        tf_z = tf.random.truncated_normal([200_000], seed=3).numpy()
        z = np.asarray(sample_z(jax.random.PRNGKey(3), (200_000,), "truncated", 2.0))
        assert np.abs(z).max() <= 2.0 and np.abs(tf_z).max() <= 2.0
        np.testing.assert_allclose(z.mean(), tf_z.mean(), atol=5e-3)
        np.testing.assert_allclose(z.std(), tf_z.std(), atol=5e-3)
