"""TF-checkpoint import: write a real TF checkpoint, import into the pytree."""

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

from biggan_tpu.checkpoint.tf_import import (  # noqa: E402
    _apply_rules,
    _canonical_value,
    import_tf_checkpoint,
)
from biggan_tpu.configs import get_config  # noqa: E402
from biggan_tpu.training.train_state import create_train_state  # noqa: E402


def test_name_rules():
    assert _apply_rules("generator/fc_seed/kernel") == "g/fc_seed/kernel"
    assert _apply_rules("discriminator/conv_0/w") == "d/conv_0/kernel"
    assert _apply_rules("generator/bn/moving_mean") == "g/bn/mean"
    assert _apply_rules("generator/bn/gamma") == "g/bn/scale"


def test_canonical_value_transposes():
    deconv = np.zeros((3, 3, 64, 32))  # HWOI
    out = _canonical_value("generator/deconv_0/w", deconv)
    assert out.shape == (3, 3, 32, 64)
    u = np.zeros((1, 64))
    assert _canonical_value("generator/conv_0/u", u).shape == (64,)
    conv = np.zeros((3, 3, 16, 32))
    assert _canonical_value("generator/conv_1/w", conv).shape == (3, 3, 16, 32)


def test_roundtrip_shape_matching(tmp_path):
    """TF checkpoint with reference-style scopes lands in the right leaves
    (stage-2 shape matching since scope names differ from ours)."""
    import jax

    cfg = get_config(
        "biggan32_cifar10", ch=8, num_classes=0, batch_size=4,
        z_dim=16, compute_dtype="float32", sn=False,
    )
    state = create_train_state(cfg, jax.random.PRNGKey(0))

    # collect a few uniquely-shaped generator param leaves to impersonate
    import flax.traverse_util as tu

    flat = tu.flatten_dict(state.g_params, sep="/")
    by_shape = {}
    for k, v in flat.items():
        by_shape.setdefault(v.shape, []).append(k)
    unique = {shape: ks[0] for shape, ks in by_shape.items() if len(ks) == 1}
    assert unique, "need at least one uniquely-shaped leaf"

    graph = tf.Graph()
    rng = np.random.RandomState(0)
    targets = {}
    with graph.as_default():
        with tf.compat.v1.variable_scope("generator"):
            for i, (shape, key) in enumerate(sorted(unique.items(), key=str)[:4]):
                val = rng.randn(*shape).astype(np.float32)
                tf.compat.v1.get_variable(f"impostor_{i}", initializer=val)
                targets[key] = val
        saver = tf.compat.v1.train.Saver()
        with tf.compat.v1.Session(graph=graph) as sess:
            sess.run(tf.compat.v1.global_variables_initializer())
            ckpt = saver.save(sess, str(tmp_path / "BigGAN.model"), global_step=7)

    new_state, report = import_tf_checkpoint(ckpt, state)
    assert len(report.matched) == len(targets)
    new_flat = tu.flatten_dict(new_state.g_params, sep="/")
    ema_flat = tu.flatten_dict(new_state.g_ema_params, sep="/")
    for key, val in targets.items():
        np.testing.assert_allclose(new_flat[key], val, atol=1e-6)
        # swapping_saver semantics: imported weights are also the EMA
        np.testing.assert_allclose(ema_flat[key], val, atol=1e-6)
