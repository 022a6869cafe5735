"""Reconstruction of the reference BigGAN-Tensorflow graph in tf.compat.v1.

The reference mount was empty both rounds (SURVEY.md §0), so this is a
from-spec reconstruction of ref ``ops.py`` + ``BigGAN_128.generator`` /
``discriminator`` built strictly from SURVEY §2.2 (op semantics table) and
§3.3 (forward trace), with the upstream variable-scope layout
(``generator/resblock_up_16/res1/batch_norm/beta/dense/kernel`` …). It is
the golden harness for ``tests/test_tf_golden_e2e.py``: save a checkpoint
from this graph, import it with ``biggan_tpu.checkpoint.tf_import``, and
demand name-complete matching plus element-wise forward parity.

Eval-mode only (``is_training=False``): the golden comparison runs the test
heads (pop-stat BN, stored-``u`` spectral norm), which is exactly what an
imported checkpoint is used for first. No optimizer, no EMA machinery —
the importer's swapping-saver semantics are covered by the fact that the
saved G slots are themselves the weights being compared.
"""

from __future__ import annotations

from typing import Dict

import numpy as np
import tensorflow as tf

tf1 = tf.compat.v1

_EPS = 1e-5


def _weight_init():
    # ref weight_init: truncated_normal(0, 0.02), ops.py:~8
    return tf1.truncated_normal_initializer(stddev=0.02)


def spectral_norm(w: tf.Tensor) -> tf.Tensor:
    """Ref ``spectral_norm`` (ops.py:~403-430): reshape to [-1, last], one
    power iteration from a persistent ``u``, stop-gradients, divide by σ.
    The golden harness never trains, so the ``u.assign`` side effect is
    irrelevant and omitted; σ is computed identically."""
    shape = w.shape.as_list()
    w_mat = tf.reshape(w, [-1, shape[-1]])
    u = tf1.get_variable(
        "u", [1, shape[-1]], initializer=tf1.random_normal_initializer(), trainable=False
    )
    v = tf.math.l2_normalize(tf.matmul(u, w_mat, transpose_b=True))
    u_new = tf.math.l2_normalize(tf.matmul(v, w_mat))
    u_new = tf.stop_gradient(u_new)
    v = tf.stop_gradient(v)
    sigma = tf.matmul(tf.matmul(v, w_mat), u_new, transpose_b=True)
    return tf.reshape(w_mat / sigma, shape)


def conv(x, channels, kernel=3, stride=1, pad=0, use_bias=True, sn=True, scope="conv_0"):
    """Ref ``conv`` (ops.py:~40-75): manual zero pad then VALID conv."""
    with tf1.variable_scope(scope):
        if pad > 0:
            h = x.shape.as_list()[1]
            p = pad * 2 if h % stride == 0 else max(kernel - (h % stride), 0)
            top, left = p // 2, p // 2
            x = tf.pad(x, [[0, 0], [top, p - top], [left, p - left], [0, 0]])
        w = tf1.get_variable(
            "kernel", [kernel, kernel, x.shape.as_list()[-1], channels],
            initializer=_weight_init(),
        )
        x = tf.nn.conv2d(x, spectral_norm(w) if sn else w,
                         strides=[1, stride, stride, 1], padding="VALID")
        if use_bias:
            b = tf1.get_variable("bias", [channels], initializer=tf1.zeros_initializer())
            x = tf.nn.bias_add(x, b)
    return x


def deconv(x, channels, kernel=3, stride=2, use_bias=True, sn=True, scope="deconv_0"):
    """Ref ``deconv`` (ops.py:~78-110): conv2d_transpose SAME, HWOI kernel."""
    with tf1.variable_scope(scope):
        shape = x.shape.as_list()
        out_shape = [shape[0], shape[1] * stride, shape[2] * stride, channels]
        w = tf1.get_variable(
            "kernel", [kernel, kernel, channels, shape[-1]], initializer=_weight_init()
        )
        x = tf.nn.conv2d_transpose(x, spectral_norm(w) if sn else w, output_shape=out_shape,
                                   strides=[1, stride, stride, 1], padding="SAME")
        if use_bias:
            b = tf1.get_variable("bias", [channels], initializer=tf1.zeros_initializer())
            x = tf.nn.bias_add(x, b)
    return x


def fully_connected(x, units, use_bias=True, sn=True, scope="fully_0"):
    """Ref ``fully_connected`` (ops.py:~113-135). The non-SN branch goes
    through ``tf.layers.dense`` upstream, which nests a ``dense`` scope —
    reproduced here for name fidelity."""
    with tf1.variable_scope(scope):
        ch = x.shape.as_list()[-1]
        if sn:
            w = tf1.get_variable("kernel", [ch, units], initializer=_weight_init())
            x = tf.matmul(x, spectral_norm(w))
            if use_bias:
                b = tf1.get_variable("bias", [units], initializer=tf1.zeros_initializer())
                x = x + b
        else:
            with tf1.variable_scope("dense"):
                w = tf1.get_variable("kernel", [ch, units], initializer=_weight_init())
                x = tf.matmul(x, w)
                if use_bias:
                    b = tf1.get_variable("bias", [units], initializer=tf1.zeros_initializer())
                    x = x + b
    return x


def batch_norm(x, is_training, scope="batch_norm"):
    """Ref ``batch_norm`` (ops.py:~358-365): contrib BN, decay .9, eps 1e-5.
    Contrib variable naming: gamma/beta/moving_mean/moving_variance."""
    with tf1.variable_scope(scope):
        c = x.shape.as_list()[-1]
        gamma = tf1.get_variable("gamma", [c], initializer=tf1.ones_initializer())
        beta = tf1.get_variable("beta", [c], initializer=tf1.zeros_initializer())
        mm = tf1.get_variable("moving_mean", [c], initializer=tf1.zeros_initializer(),
                              trainable=False)
        mv = tf1.get_variable("moving_variance", [c], initializer=tf1.ones_initializer(),
                              trainable=False)
        if is_training:
            mean, var = tf.nn.moments(x, [0, 1, 2])
        else:
            mean, var = mm, mv
        return tf.nn.batch_normalization(x, mean, var, beta, gamma, _EPS)


def condition_batch_norm(x, z, is_training, scope="batch_norm"):
    """Ref ``condition_batch_norm`` (ops.py:~368-400): per-example γ/β from
    plain (non-SN, biased) FCs of z; pop_mean/pop_var EMA stats."""
    with tf1.variable_scope(scope):
        c = x.shape.as_list()[-1]
        pm = tf1.get_variable("pop_mean", [c], initializer=tf1.zeros_initializer(),
                              trainable=False)
        pv = tf1.get_variable("pop_var", [c], initializer=tf1.ones_initializer(),
                              trainable=False)
        beta = fully_connected(z, c, use_bias=True, sn=False, scope="beta")
        gamma = fully_connected(z, c, use_bias=True, sn=False, scope="gamma")
        beta = tf.reshape(beta, [-1, 1, 1, c])
        gamma = tf.reshape(gamma, [-1, 1, 1, c])
        if is_training:
            mean, var = tf.nn.moments(x, [0, 1, 2])
        else:
            mean, var = pm, pv
        return tf.nn.batch_normalization(x, mean, var, beta, gamma, _EPS)


def _hw_flatten(x):
    b, h, w, c = x.shape.as_list()
    return tf.reshape(x, [b, h * w, c])


def self_attention_2(x, channels, sn=True, scope="self_attention"):
    """Ref ``self_attention_2`` (ops.py:~278-310): pooled keys/values."""
    with tf1.variable_scope(scope):
        b, h, w, _ = x.shape.as_list()
        f = conv(x, max(channels // 8, 1), kernel=1, stride=1, sn=sn, scope="f_conv")
        f = tf.nn.max_pool2d(f, 2, 2, "SAME")
        g = conv(x, max(channels // 8, 1), kernel=1, stride=1, sn=sn, scope="g_conv")
        hh = conv(x, max(channels // 2, 1), kernel=1, stride=1, sn=sn, scope="h_conv")
        hh = tf.nn.max_pool2d(hh, 2, 2, "SAME")
        s = tf.matmul(_hw_flatten(g), _hw_flatten(f), transpose_b=True)
        attn = tf.nn.softmax(s)
        o = tf.matmul(attn, _hw_flatten(hh))
        gamma = tf1.get_variable("gamma", [1], initializer=tf1.zeros_initializer())
        o = tf.reshape(o, [b, h, w, max(channels // 2, 1)])
        o = conv(o, channels, kernel=1, stride=1, sn=sn, scope="attn_conv")
        return gamma * o + x


def resblock_up_condition(x, z, channels, use_bias=False, is_training=False, sn=True,
                          scope="resblock_up"):
    """Ref ``resblock_up_condition`` (ops.py:~198-222): cBN→ReLU→deconv(s2),
    cBN→ReLU→deconv(s1), skip deconv(s2)."""
    with tf1.variable_scope(scope):
        with tf1.variable_scope("res1"):
            h = condition_batch_norm(x, z, is_training)
            h = tf.nn.relu(h)
            h = deconv(h, channels, kernel=3, stride=2, use_bias=use_bias, sn=sn)
        with tf1.variable_scope("res2"):
            h = condition_batch_norm(h, z, is_training)
            h = tf.nn.relu(h)
            h = deconv(h, channels, kernel=3, stride=1, use_bias=use_bias, sn=sn)
        with tf1.variable_scope("skip"):
            s = deconv(x, channels, kernel=3, stride=2, use_bias=use_bias, sn=sn)
    return h + s


def resblock_down(x, channels, use_bias=False, is_training=False, sn=True,
                  scope="resblock_down"):
    """Ref ``resblock_down`` (ops.py:~225-247): BN→ReLU→conv(s2),
    BN→ReLU→conv(s1), skip conv(s2)."""
    with tf1.variable_scope(scope):
        with tf1.variable_scope("res1"):
            h = batch_norm(x, is_training)
            h = tf.nn.relu(h)
            h = conv(h, channels, kernel=3, stride=2, pad=1, use_bias=use_bias, sn=sn)
        with tf1.variable_scope("res2"):
            h = batch_norm(h, is_training)
            h = tf.nn.relu(h)
            h = conv(h, channels, kernel=3, stride=1, pad=1, use_bias=use_bias, sn=sn)
        with tf1.variable_scope("skip"):
            s = conv(x, channels, kernel=3, stride=2, pad=1, use_bias=use_bias, sn=sn)
    return h + s


def resblock(x, channels, use_bias=False, is_training=False, sn=True, scope="resblock"):
    """Ref ``resblock`` (ops.py:~150-170): BN→ReLU→conv ×2, identity skip."""
    with tf1.variable_scope(scope):
        with tf1.variable_scope("res1"):
            h = batch_norm(x, is_training)
            h = tf.nn.relu(h)
            h = conv(h, channels, kernel=3, stride=1, pad=1, use_bias=use_bias, sn=sn)
        with tf1.variable_scope("res2"):
            h = batch_norm(h, is_training)
            h = tf.nn.relu(h)
            h = conv(h, channels, kernel=3, stride=1, pad=1, use_bias=use_bias, sn=sn)
    return h + x


def _split_z(z: tf.Tensor, num_chunks: int):
    """Same contiguous even-as-possible split as biggan_tpu.models.nets.split_z."""
    z_dim = z.shape.as_list()[-1]
    base, rem = divmod(z_dim, num_chunks)
    sizes = [base + (1 if i < rem else 0) for i in range(num_chunks)]
    return tf.split(z, sizes, axis=-1)


def _uniquify(seen: Dict[str, int], base: str) -> str:
    n = seen.get(base, 0)
    seen[base] = n + 1
    return base if n == 0 else f"{base}_{n}"


def generator(z, img_size, ch, is_training=False):
    """Ref ``BigGAN_128.generator`` (:~65-110) generalized by the same arch
    table the JAX build uses (SURVEY §3.3 stack)."""
    from biggan_tpu.models.arch import get_arch

    arch = get_arch(img_size)
    with tf1.variable_scope("generator"):
        chunks = _split_z(z, arch.num_z_chunks)
        c = arch.g_seed_mult * ch
        x = fully_connected(chunks[0], 4 * 4 * c, use_bias=True, sn=True, scope="dense")
        x = tf.reshape(x, [-1, 4, 4, c])
        res, seen = 4, {}
        for i, mult in enumerate(arch.g_ch_mults):
            scope = _uniquify(seen, f"resblock_up_{mult}")
            x = resblock_up_condition(
                x, chunks[i + 1], mult * ch, use_bias=False,
                is_training=is_training, sn=True, scope=scope,
            )
            res *= 2
            if arch.attn_res is not None and res == arch.attn_res:
                x = self_attention_2(x, mult * ch, sn=True)
        x = batch_norm(x, is_training)
        x = tf.nn.relu(x)
        x = conv(x, 3, kernel=3, stride=1, pad=1, use_bias=False, sn=True, scope="G_logit")
        return tf.nn.tanh(x)


def discriminator(x, img_size, ch, is_training=False):
    """Ref ``BigGAN_128.discriminator`` (:~115-150)."""
    from biggan_tpu.models.arch import get_arch

    arch = get_arch(img_size)
    with tf1.variable_scope("discriminator"):
        res, seen = img_size, {}
        for i, mult in enumerate(arch.d_ch_mults):
            scope = _uniquify(seen, f"resblock_down_{mult}")
            x = resblock_down(x, mult * ch, use_bias=False,
                              is_training=is_training, sn=True, scope=scope)
            res //= 2
            if arch.attn_res is not None and res == arch.attn_res:
                x = self_attention_2(x, mult * ch, sn=True)
        x = resblock(x, arch.d_ch_mults[-1] * ch, use_bias=False,
                     is_training=is_training, sn=True, scope="resblock")
        x = tf.nn.relu(x)
        x = tf.reduce_sum(x, axis=[1, 2])  # global sum pooling
        x = fully_connected(x, 1, use_bias=True, sn=True, scope="D_logit")
    return x


def build_and_save(ckpt_path: str, img_size: int, ch: int, z_dim: int, batch: int,
                   seed: int = 0):
    """Build the reference graph, randomize its state (incl. the
    non-trainable pop stats, so eval-mode parity is nontrivial), save a
    checkpoint, and return eval-mode golden outputs.

    Returns ``(z, x, g_out, d_real_out, d_fake_out)`` as numpy arrays.
    """
    rng = np.random.RandomState(seed)
    z_np = rng.randn(batch, z_dim).astype(np.float32)
    x_np = np.tanh(rng.randn(batch, img_size, img_size, 3).astype(np.float32))

    graph = tf.Graph()
    with graph.as_default():
        tf1.set_random_seed(seed)
        z = tf1.placeholder(tf.float32, [batch, z_dim], name="z")
        x = tf1.placeholder(tf.float32, [batch, img_size, img_size, 3], name="x")
        fake = generator(z, img_size, ch, is_training=False)
        d_real = discriminator(x, img_size, ch, is_training=False)
        tf1.get_variable_scope().reuse_variables()
        d_fake = discriminator(fake, img_size, ch, is_training=False)
        # train-mode heads (batch-moment BN/cBN path; same variables)
        fake_train = generator(z, img_size, ch, is_training=True)
        d_real_train = discriminator(x, img_size, ch, is_training=True)

        # randomize the running stats so pop-stat parity is exercised
        assigns = []
        for v in tf1.global_variables():
            name = v.op.name
            if name.endswith(("pop_mean", "moving_mean")):
                assigns.append(v.assign(rng.randn(*v.shape.as_list()).astype(np.float32) * 0.1))
            elif name.endswith(("pop_var", "moving_variance")):
                assigns.append(v.assign(rng.uniform(0.5, 1.5, v.shape.as_list()).astype(np.float32)))

        saver = tf1.train.Saver()
        with tf1.Session(graph=graph) as sess:
            sess.run(tf1.global_variables_initializer())
            sess.run(assigns)
            g_out, dr_out, df_out, g_tr, dr_tr = sess.run(
                [fake, d_real, d_fake, fake_train, d_real_train],
                feed_dict={z: z_np, x: x_np},
            )
            saved = saver.save(sess, ckpt_path, global_step=100)
    return z_np, x_np, g_out, dr_out, df_out, saved, g_tr, dr_tr
