"""Tests for the FID / Inception Score subsystem."""

import numpy as np
import pytest

from biggan_tpu.eval.fid import StreamingMoments, compute_fid, frechet_distance
from biggan_tpu.eval.inception_score import inception_score_from_probs


class TestFrechetDistance:
    def test_identical_distributions_zero(self):
        rng = np.random.RandomState(0)
        mu = rng.randn(8)
        a = rng.randn(64, 8)
        cov = np.cov(a, rowvar=False)
        assert frechet_distance(mu, cov, mu, cov) == pytest.approx(0.0, abs=1e-6)

    def test_mean_shift_only(self):
        """Equal covariances → FID = ‖Δμ‖²."""
        cov = np.eye(4)
        mu1, mu2 = np.zeros(4), np.array([3.0, 0, 0, 0])
        assert frechet_distance(mu1, cov, mu2, cov) == pytest.approx(9.0, abs=1e-6)

    def test_diagonal_covariances_closed_form(self):
        # diag covs: FID = Σ (√a − √b)²  (means equal)
        a, b = np.array([1.0, 4.0]), np.array([9.0, 16.0])
        expected = np.sum((np.sqrt(a) - np.sqrt(b)) ** 2)
        got = frechet_distance(np.zeros(2), np.diag(a), np.zeros(2), np.diag(b))
        assert got == pytest.approx(expected, abs=1e-6)

    def test_singular_covariance_jitter_fallback(self):
        cov_sing = np.zeros((3, 3))  # rank 0
        d = frechet_distance(np.zeros(3), cov_sing, np.ones(3), np.eye(3))
        assert np.isfinite(d) and d > 0


class TestStreamingMoments:
    def test_matches_batch_statistics(self):
        rng = np.random.RandomState(1)
        data = rng.randn(500, 16)
        m = StreamingMoments(16)
        for chunk in np.array_split(data, 7):
            m.update(chunk)
        mu, cov = m.finalize()
        np.testing.assert_allclose(mu, data.mean(axis=0), atol=1e-10)
        np.testing.assert_allclose(cov, np.cov(data, rowvar=False), atol=1e-10)


class TestInceptionScore:
    def test_uniform_probs_score_one(self):
        probs = np.full((100, 10), 0.1)
        mean, std = inception_score_from_probs(probs, splits=2)
        assert mean == pytest.approx(1.0, abs=1e-6)

    def test_confident_diverse_is_high(self):
        """One-hot over many classes, uniformly covered → IS ≈ num_classes."""
        n_cls = 10
        probs = np.eye(n_cls)[np.arange(200) % n_cls]
        # smooth slightly to avoid log(0)
        probs = probs * 0.999 + 0.001 / n_cls
        mean, _ = inception_score_from_probs(probs, splits=1)
        assert mean == pytest.approx(n_cls, rel=0.05)

    def test_mode_collapse_is_low(self):
        probs = np.zeros((100, 10))
        probs[:, 3] = 1.0
        probs = probs * 0.999 + 0.001 / 10
        mean, _ = inception_score_from_probs(probs, splits=1)
        assert mean < 1.1


class TestInceptionNetwork:
    @pytest.mark.slow
    def test_feature_shapes_and_fid_sanity(self, rng):
        """Random-init Inception: features have the right shape and FID
        separates identical from shifted image distributions."""
        import jax

        from biggan_tpu.eval.inception import FEATURE_DIM, load_params, make_feature_fn

        params, pretrained = load_params(seed=0)
        assert not pretrained  # no weights file in this environment
        feature_fn = make_feature_fn(params)

        imgs_a = jax.random.uniform(rng, (4, 32, 32, 3), minval=-1, maxval=1)
        feats, probs = feature_fn(imgs_a)
        assert feats.shape == (4, FEATURE_DIM)
        assert probs.shape[0] == 4
        np.testing.assert_allclose(np.asarray(probs).sum(axis=-1), 1.0, rtol=1e-4)

        # same batch twice → FID 0; shifted batch → FID > 0
        def batches(x):
            return [np.asarray(x[:2]), np.asarray(x[2:])]

        fid_same = compute_fid(batches(imgs_a), batches(imgs_a), feature_fn, max_samples=4)
        assert fid_same == pytest.approx(0.0, abs=1e-3)
        imgs_b = np.clip(np.asarray(imgs_a) * 0.2 + 0.5, -1, 1)
        fid_diff = compute_fid(batches(imgs_a), batches(imgs_b), feature_fn, max_samples=4)
        assert fid_diff > fid_same


class TestRandomFeatureDiscriminativeness:
    @pytest.mark.slow
    def test_random_features_separate_distributions(self):
        """Regression: the random-init fallback must actually discriminate.
        (With flax's default lecun init, 20 ReLU layers collapsed features
        to ~1e-6 std and FID(structured, noise) measured 1.7e-05 — useless
        for trend evidence. he_normal keeps variance alive; demand a wide
        margin between different-dist and same-dist FIDs.)"""
        import jax.numpy as jnp

        from biggan_tpu.data.toy import render
        from biggan_tpu.eval.fid import StreamingMoments, frechet_distance
        from biggan_tpu.eval.inception import FEATURE_DIM, load_params, make_feature_fn

        params, pretrained = load_params(seed=0)
        assert not pretrained
        fn = make_feature_fn(params)
        rng = np.random.RandomState(0)
        structured = np.stack(
            [render(i % 10, np.random.default_rng(i), 32) for i in range(96)]
        ).astype(np.float32) / 127.5 - 1.0
        noise = rng.rand(96, 32, 32, 3).astype(np.float32) * 2 - 1

        fa = np.asarray(fn(jnp.asarray(structured))[0])
        fb = np.asarray(fn(jnp.asarray(noise))[0])
        assert fa.std() > 1e-2, "random features collapsed again"

        def fid(x, y):
            mx, my = StreamingMoments(FEATURE_DIM), StreamingMoments(FEATURE_DIM)
            mx.update(x)
            my.update(y)
            return frechet_distance(*mx.finalize(), *my.finalize())

        different = fid(fa, fb)
        same = fid(fa[:48], fa[48:])
        assert different > 5 * same, (different, same)


class TestEvaluateGan:
    def test_harness_end_to_end_mocked_inception(self, tmp_path, monkeypatch):
        """evaluate_gan streams real + fake through the extractor and
        returns labeled metrics (mock extractor: fast, deterministic)."""
        import jax
        import numpy as np

        import biggan_tpu.eval.harness as harness
        from biggan_tpu.configs import GANConfig
        from biggan_tpu.models.biggan import BigGAN

        monkeypatch.chdir(tmp_path)
        cfg = GANConfig(
            dataset="synthetic", img_size=32, ch=8, z_dim=16, num_classes=4,
            batch_size=4, compute_dtype="float32", sample_num=4, eval_num=8,
        )
        gan = BigGAN(cfg)
        gan.build_model()

        dim = harness.FEATURE_DIM

        def fake_load_params(weights_path=None, seed=0):
            return {}, False

        def fake_make_feature_fn(params, batch_dtype=None):
            def fn(images):
                x = np.asarray(images, np.float32).reshape(images.shape[0], -1)
                rng = np.random.RandomState(0)
                proj = rng.randn(x.shape[1], dim).astype(np.float32) * 0.01
                feats = x @ proj
                probs = np.full((x.shape[0], 10), 0.1, np.float32)
                return feats, probs
            return fn

        monkeypatch.setattr(harness, "load_params", fake_load_params)
        monkeypatch.setattr(harness, "make_feature_fn", fake_make_feature_fn)

        out = harness.evaluate_gan(gan, num_samples=8, batch_size=4)
        assert out["num_samples"] == 8
        assert not out["pretrained_inception"]
        assert "fid_random_features" in out
        assert np.isfinite(out["fid_random_features"])
        assert out["inception_score_random_features"] == pytest.approx(1.0, abs=1e-5)


def test_config_json_roundtrip():
    from biggan_tpu.configs import GANConfig

    cfg = GANConfig(img_size=64, ch=32, remat=True, mesh_shape=(4, 2))
    cfg2 = GANConfig.from_json(cfg.to_json())
    assert cfg2 == cfg


class TestInceptionConverter:
    def test_converted_keys_cover_model_tree_exactly(self):
        """Build a pytorch-fid-style state_dict (synthetic values, shapes
        derived from our flax model), convert, and check it fills the model
        tree 1:1 — validates every branch-name mapping."""
        import jax
        import jax.numpy as jnp
        import flax.traverse_util as tu

        from biggan_tpu.eval.convert_inception import (
            _BLOCK_KIND,
            _BRANCH_MAPS,
            _STEM,
            convert,
        )
        from biggan_tpu.eval.inception import InceptionV3

        model = InceptionV3()
        tree = jax.eval_shape(
            lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((1, 299, 299, 3)))
        )
        ours = tu.flatten_dict(tree, sep="/")  # keys like params/Mixed_5b/b0/conv/kernel

        inv_stem = {v: k for k, v in _STEM.items()}
        inv_branch = {
            kind: {v: k for k, v in m.items()} for kind, m in _BRANCH_MAPS.items()
        }

        import numpy as np

        def torch_key(our_key):
            parts = our_key.split("/")[1:]  # drop "params"
            leaf_map = {
                "bn_scale": "bn.weight", "bn_bias": "bn.bias",
                "bn_mean": "bn.running_mean", "bn_var": "bn.running_var",
            }
            if parts[0] == "logits":
                return "fc." + ("weight" if parts[1] == "kernel" else "bias")
            if parts[0] in inv_stem:
                scope = inv_stem[parts[0]]
                leaf = "conv.weight" if parts[1] == "conv" else leaf_map[parts[1]]
                return f"{scope}.{leaf}"
            kind = _BLOCK_KIND[parts[0]]
            branch = inv_branch[kind][parts[1]]
            leaf = "conv.weight" if parts[2] == "conv" else leaf_map[parts[2]]
            return f"{parts[0]}.{branch}.{leaf}"

        def torch_shape(our_key, shape):
            if our_key.endswith("conv/kernel"):
                h, w, i, o = shape
                return (o, i, h, w)
            if our_key == "params/logits/kernel":
                return (shape[1], shape[0])
            return shape

        state_dict = {
            torch_key(k): np.zeros(torch_shape(k, v.shape), np.float32)
            for k, v in ours.items()
        }
        state_dict["Mixed_5b.branch1x1.bn.num_batches_tracked"] = np.zeros(())

        out = convert(state_dict)
        assert set(out) == set(ours), (
            set(out) ^ set(ours)
        )
        for k, v in out.items():
            assert v.shape == ours[k].shape, (k, v.shape, ours[k].shape)


def test_converter_end_to_end_pth_to_features(tmp_path):
    """The full exact-FID weights path, exercised synthetically: a random
    .pth in pytorch-fid state_dict naming → ``convert_inception`` CLI →
    npz → ``load_params`` (pretrained=True) → ``make_feature_fn`` on real
    image shapes. No network access anywhere."""
    torch = pytest.importorskip("torch")
    import jax
    import jax.numpy as jnp
    import numpy as np
    import flax.traverse_util as tu

    from biggan_tpu.eval import convert_inception
    from biggan_tpu.eval.convert_inception import _BLOCK_KIND, _BRANCH_MAPS, _STEM
    from biggan_tpu.eval.inception import InceptionV3, load_params, make_feature_fn

    model = InceptionV3()
    tree = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((1, 299, 299, 3)))
    )
    ours = tu.flatten_dict(tree, sep="/")

    inv_stem = {v: k for k, v in _STEM.items()}
    inv_branch = {kind: {v: k for k, v in m.items()} for kind, m in _BRANCH_MAPS.items()}
    leaf_map = {
        "bn_scale": "bn.weight", "bn_bias": "bn.bias",
        "bn_mean": "bn.running_mean", "bn_var": "bn.running_var",
    }

    def torch_key(our_key):
        parts = our_key.split("/")[1:]
        if parts[0] == "logits":
            return "fc." + ("weight" if parts[1] == "kernel" else "bias")
        if parts[0] in inv_stem:
            leaf = "conv.weight" if parts[1] == "conv" else leaf_map[parts[1]]
            return f"{inv_stem[parts[0]]}.{leaf}"
        branch = inv_branch[_BLOCK_KIND[parts[0]]][parts[1]]
        leaf = "conv.weight" if parts[2] == "conv" else leaf_map[parts[2]]
        return f"{parts[0]}.{branch}.{leaf}"

    def torch_shape(our_key, shape):
        if our_key.endswith("conv/kernel"):
            h, w, i, o = shape
            return (o, i, h, w)
        if our_key == "params/logits/kernel":
            return (shape[1], shape[0])
        return tuple(shape)

    rng = np.random.RandomState(0)
    state_dict = {}
    for k, v in ours.items():
        arr = rng.randn(*torch_shape(k, v.shape)).astype(np.float32) * 0.05
        if k.endswith("bn_var"):
            arr = np.abs(arr) + 0.5  # variances must be positive
        state_dict[torch_key(k)] = torch.from_numpy(arr)

    src = tmp_path / "pt_inception_synthetic.pth"
    dst = tmp_path / "inception.npz"
    torch.save(state_dict, src)
    assert convert_inception.main([str(src), str(dst)]) == 0

    params, pretrained = load_params(str(dst))
    assert pretrained is True
    feature_fn = make_feature_fn(params)
    images = rng.rand(2, 64, 64, 3).astype(np.float32) * 2 - 1
    feats, probs = feature_fn(jnp.asarray(images))
    assert feats.shape == (2, 2048) and probs.shape == (2, 1008)
    assert np.isfinite(np.asarray(feats)).all()
    np.testing.assert_allclose(np.asarray(probs).sum(-1), 1.0, rtol=1e-4)
    # loaded weights are the converted ones, not a random re-init
    got = tu.flatten_dict(params, sep="/")["params/Conv2d_1a/conv/kernel"]
    want = np.transpose(
        state_dict["Conv2d_1a_3x3.conv.weight"].numpy(), (2, 3, 1, 0)
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-6)


def test_load_params_rejects_mismatched_weights(tmp_path):
    """A stale/mismatched weights npz must fail loudly at load, not deep
    inside a jitted apply."""
    import numpy as np

    from biggan_tpu.eval.inception import load_params

    bad = tmp_path / "bad.npz"
    np.savez(bad, **{"params/Conv2d_1a/conv/kernel": np.zeros((3, 3, 3, 32), np.float32)})
    with pytest.raises(ValueError, match="do not match"):
        load_params(str(bad))


@pytest.mark.slow
def test_random_feature_fid_frozen_value():
    """The random-feature FID pipeline (seed → random Inception init →
    features → Fréchet distance) must be stable across refactors: relative
    learning-curve comparisons (RESULTS.md) are only meaningful if the
    metric itself doesn't drift. Frozen value recorded 2026-08-17."""
    from biggan_tpu.eval.fid import compute_fid
    from biggan_tpu.eval.inception import load_params, make_feature_fn

    params, pretrained = load_params(None, 0)
    assert not pretrained
    fn = make_feature_fn(params)
    rng = np.random.RandomState(0)
    a = (rng.rand(8, 32, 32, 3) * 2 - 1).astype(np.float32)
    b = (rng.rand(8, 32, 32, 3) * 2 - 1).astype(np.float32)
    fid_ab = compute_fid([a], [b], fn, max_samples=8)
    fid_aa = compute_fid([a], [a.copy()], fn, max_samples=8)
    np.testing.assert_allclose(fid_ab, 0.97867, rtol=0.05)
    assert abs(fid_aa) < 1e-3  # identical sets -> ~0
