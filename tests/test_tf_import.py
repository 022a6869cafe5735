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
    # running stats are rerouted into the batch_stats collection
    assert _apply_rules("generator/bn/moving_mean") == "g/batch_stats/bn/mean"
    # SN u vectors are rerouted into the sn_u collection
    assert _apply_rules("generator/conv_0/u") == "g/sn_u/conv_0/u"


def test_reference_name_rules_128():
    """The arch-aware rules map the full upstream scope layout by name."""
    from biggan_tpu.checkpoint.tf_import import reference_name_rules

    rules = reference_name_rules(128)
    cases = {
        "generator/dense/kernel": "g/fc_seed/kernel",
        "generator/dense/u": "g/sn_u/fc_seed/u",
        "generator/resblock_up_16/res1/batch_norm/beta/dense/kernel":
            "g/block_up_0/cbn1/beta/kernel",
        "generator/resblock_up_16/res1/batch_norm/pop_mean":
            "g/batch_stats/block_up_0/cbn1/mean",
        "generator/resblock_up_16/res1/deconv_0/kernel": "g/block_up_0/conv1/kernel",
        "generator/resblock_up_16/res2/deconv_0/u": "g/sn_u/block_up_0/conv2/u",
        "generator/resblock_up_1/skip/deconv_0/kernel": "g/block_up_4/skip/kernel",
        "generator/self_attention/f_conv/kernel": "g/attn/f_conv/kernel",
        "generator/self_attention/gamma": "g/attn/gamma",
        "generator/batch_norm/gamma": "g/bn_out/scale",
        "generator/batch_norm/moving_variance": "g/batch_stats/bn_out/var",
        "generator/G_logit/kernel": "g/conv_out/kernel",
        "discriminator/resblock_down_1/res1/batch_norm/gamma":
            "d/block_down_0/bn1/scale",
        "discriminator/resblock_down_1/res1/batch_norm/moving_mean":
            "d/batch_stats/block_down_0/bn1/mean",
        "discriminator/resblock_down_16/res2/conv_0/kernel":
            "d/block_down_4/conv2/kernel",
        "discriminator/resblock_down_2/skip/conv_0/u": "d/sn_u/block_down_1/skip/u",
        "discriminator/resblock/res1/conv_0/kernel": "d/block_final/conv1/kernel",
        "discriminator/D_logit/kernel": "d/fc_logit/kernel",
    }
    for tf_name, expected in cases.items():
        assert _apply_rules(tf_name, rules) == expected, tf_name


def test_reference_name_rules_uniquified_scopes_256():
    """256px repeats mult 8 — TF scope auto-uniquify maps to block indices."""
    from biggan_tpu.checkpoint.tf_import import reference_name_rules

    rules = reference_name_rules(256)
    assert _apply_rules(
        "generator/resblock_up_8/res1/deconv_0/kernel", rules
    ) == "g/block_up_1/conv1/kernel"
    assert _apply_rules(
        "generator/resblock_up_8_1/res1/deconv_0/kernel", rules
    ) == "g/block_up_2/conv1/kernel"


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


def _g_targets(state):
    """Flatten the generator's full import-target set like the importer."""
    import flax.traverse_util as tu

    out = {f"g/{k}": v for k, v in tu.flatten_dict(state.g_params, sep="/").items()}
    for coll, tree in state.g_state.items():
        out.update(
            {f"g/{coll}/{k}": v for k, v in tu.flatten_dict(tree, sep="/").items()}
        )
    return out


def _save_tf_vars(tmp_path, named_values):
    graph = tf.Graph()
    with graph.as_default():
        for name, val in named_values.items():
            scope, _, leaf = name.rpartition("/")
            with tf.compat.v1.variable_scope(scope):
                tf.compat.v1.get_variable(leaf, initializer=val)
        saver = tf.compat.v1.train.Saver()
        with tf.compat.v1.Session(graph=graph) as sess:
            sess.run(tf.compat.v1.global_variables_initializer())
            return saver.save(sess, str(tmp_path / "dup.model"), global_step=1)


def test_stage2_duplicated_shapes_assign_in_order(tmp_path):
    """Repeated shapes within a scope pair 1:1 in sorted order — the real
    BigGAN case (every same-width block kernel has an identical shape)."""
    import jax
    import flax.traverse_util as tu

    cfg = get_config(
        "biggan32_cifar10", ch=8, num_classes=0, batch_size=4,
        z_dim=16, compute_dtype="float32", sn=False,
    )
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    # bucket the importer's full target set (params + collections)
    by_shape = {}
    for k, v in _g_targets(state).items():
        by_shape.setdefault(v.shape, []).append(k)
    shape, keys = max(by_shape.items(), key=lambda kv: len(kv[1]))
    assert len(keys) >= 2, "arch should have repeated-shape kernels"

    rng = np.random.RandomState(1)
    # fork-delta scope names (won't match by name) with the same count
    named = {
        f"generator/forkblock_{i}/mystery": rng.randn(*shape).astype(np.float32)
        for i in range(len(keys))
    }
    ckpt = _save_tf_vars(tmp_path, named)
    new_state, report = import_tf_checkpoint(ckpt, state)
    assert len(report.shape_matched) == len(keys)
    # multi-element zips are surfaced (order-based, not structural)
    assert report.warnings
    # natural-sorted TF names zip onto natural-sorted target names
    from biggan_tpu.checkpoint.tf_import import _natural_key

    new_flat = _g_targets(new_state)
    for tf_name, key in zip(sorted(named, key=_natural_key), sorted(keys, key=_natural_key)):
        np.testing.assert_allclose(new_flat[key], named[tf_name], atol=1e-6)
    # and a multi-element zip is a strict error: strict demands stage-1
    # name coverage, never ordering-based correspondence
    with pytest.raises(ValueError, match="multi-element"):
        import_tf_checkpoint(ckpt, state, strict=True)


def test_stage2_natural_order_beats_lexicographic():
    """TF auto-uniquify suffixes must order numerically: 'x_2' before
    'x_10' (lexicographic zipping would cross-assign layers)."""
    from biggan_tpu.checkpoint.tf_import import _natural_key

    names = [f"generator/block_up_{i}/kernel" for i in range(12)]
    shuffled = sorted(names)  # lexicographic: block_up_10 < block_up_2
    assert shuffled != names
    assert sorted(shuffled, key=_natural_key) == names


def test_stage2_ambiguous_bucket_fails_loudly(tmp_path):
    """Unequal counts in a shape bucket: strict raises listing candidates,
    non-strict records unmatched — never a silent mis-assign."""
    import jax

    cfg = get_config(
        "biggan32_cifar10", ch=8, num_classes=0, batch_size=4,
        z_dim=16, compute_dtype="float32", sn=False,
    )
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    by_shape = {}
    for k, v in _g_targets(state).items():
        by_shape.setdefault(v.shape, []).append(k)
    shape, keys = max(by_shape.items(), key=lambda kv: len(kv[1]))

    rng = np.random.RandomState(2)
    # one MORE checkpoint var of this shape than open targets exist
    named = {
        f"generator/forkblock_{i}/mystery": rng.randn(*shape).astype(np.float32)
        for i in range(len(keys) + 1)
    }
    ckpt = _save_tf_vars(tmp_path, named)

    _, report = import_tf_checkpoint(ckpt, state, strict=False)
    assert report.ambiguous and len(report.unmatched_tf) == len(named)
    with pytest.raises(ValueError, match="ambiguous"):
        import_tf_checkpoint(ckpt, state, strict=True)
