"""InceptionV3 feature network for FID / Inception Score.

The reference repo has **no** quantitative eval (SURVEY.md §2.3 "Sampling /
eval artifacts" — FID harness is a new capability this framework adds). This
is the TF-slim InceptionV3 topology used by the standard FID implementation:
``pool3`` 2048-d features and class logits, eval-mode only (BN uses stored
stats), NHWC / bfloat16-friendly.

Weights: zero-egress environment, so pretrained weights cannot be fetched.
:func:`load_params` reads a local ``.npz`` of named arrays when available
(``BIGGAN_TPU_INCEPTION_WEIGHTS`` env var or explicit path — drop in the
converted ``pt_inception-2015-12-05`` weights for exact standard FID);
otherwise it falls back to a **deterministic seeded random init**. Random
Inception features still produce a valid *relative* metric (rankings and
training-curve trends are preserved; see FID-infinity / random-feature
literature), but absolute numbers are not comparable to published FIDs —
:func:`load_params` returns a flag so callers can label the metric.
"""

from __future__ import annotations

import os
from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

FEATURE_DIM = 2048
NUM_LOGITS = 1008  # TF-slim inception has 1008 classes (incl. background)


class _ConvBN(nn.Module):
    features: int
    kernel: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: str = "SAME"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        # he_normal, not flax's default lecun_normal: the random-init FID
        # fallback must preserve activation variance through ~20 ReLU
        # layers (lecun+ReLU halves variance per layer → features collapse
        # to ~1e-6 std and FID stops discriminating — caught empirically).
        # Irrelevant when real weights are loaded (init is overwritten).
        x = nn.Conv(
            self.features, self.kernel, self.strides, padding=self.padding,
            use_bias=False, dtype=self.dtype, name="conv",
            kernel_init=nn.initializers.he_normal(),
        )(x)
        # eval-only: BN folds to a per-channel affine from stored stats
        scale = self.param("bn_scale", nn.initializers.ones, (self.features,), jnp.float32)
        bias = self.param("bn_bias", nn.initializers.zeros, (self.features,), jnp.float32)
        mean = self.param("bn_mean", nn.initializers.zeros, (self.features,), jnp.float32)
        var = self.param("bn_var", nn.initializers.ones, (self.features,), jnp.float32)
        inv = (scale * jax.lax.rsqrt(var + 1e-3)).astype(self.dtype)
        x = x * inv + (bias - mean * scale * jax.lax.rsqrt(var + 1e-3)).astype(self.dtype)
        return nn.relu(x)


def _pool(x, kind, window=(3, 3), strides=(1, 1), padding="SAME"):
    if kind == "max":
        return nn.max_pool(x, window, strides, padding)
    return nn.avg_pool(x, window, strides, padding)


class _MixedA(nn.Module):
    """35×35 block (Mixed_5b/5c/5d)."""

    pool_features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = self.dtype
        b0 = _ConvBN(64, (1, 1), dtype=d, name="b0")(x)
        b1 = _ConvBN(48, (1, 1), dtype=d, name="b1a")(x)
        b1 = _ConvBN(64, (5, 5), dtype=d, name="b1b")(b1)
        b2 = _ConvBN(64, (1, 1), dtype=d, name="b2a")(x)
        b2 = _ConvBN(96, (3, 3), dtype=d, name="b2b")(b2)
        b2 = _ConvBN(96, (3, 3), dtype=d, name="b2c")(b2)
        b3 = _pool(x, "avg")
        b3 = _ConvBN(self.pool_features, (1, 1), dtype=d, name="b3")(b3)
        return jnp.concatenate([b0, b1, b2, b3], axis=-1)


class _ReductionA(nn.Module):
    """35→17 (Mixed_6a)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = self.dtype
        b0 = _ConvBN(384, (3, 3), (2, 2), "VALID", dtype=d, name="b0")(x)
        b1 = _ConvBN(64, (1, 1), dtype=d, name="b1a")(x)
        b1 = _ConvBN(96, (3, 3), dtype=d, name="b1b")(b1)
        b1 = _ConvBN(96, (3, 3), (2, 2), "VALID", dtype=d, name="b1c")(b1)
        b2 = _pool(x, "max", (3, 3), (2, 2), "VALID")
        return jnp.concatenate([b0, b1, b2], axis=-1)


class _MixedB(nn.Module):
    """17×17 block (Mixed_6b..6e), factorized 7×7."""

    c7: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        d, c7 = self.dtype, self.c7
        b0 = _ConvBN(192, (1, 1), dtype=d, name="b0")(x)
        b1 = _ConvBN(c7, (1, 1), dtype=d, name="b1a")(x)
        b1 = _ConvBN(c7, (1, 7), dtype=d, name="b1b")(b1)
        b1 = _ConvBN(192, (7, 1), dtype=d, name="b1c")(b1)
        b2 = _ConvBN(c7, (1, 1), dtype=d, name="b2a")(x)
        b2 = _ConvBN(c7, (7, 1), dtype=d, name="b2b")(b2)
        b2 = _ConvBN(c7, (1, 7), dtype=d, name="b2c")(b2)
        b2 = _ConvBN(c7, (7, 1), dtype=d, name="b2d")(b2)
        b2 = _ConvBN(192, (1, 7), dtype=d, name="b2e")(b2)
        b3 = _pool(x, "avg")
        b3 = _ConvBN(192, (1, 1), dtype=d, name="b3")(b3)
        return jnp.concatenate([b0, b1, b2, b3], axis=-1)


class _ReductionB(nn.Module):
    """17→8 (Mixed_7a)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = self.dtype
        b0 = _ConvBN(192, (1, 1), dtype=d, name="b0a")(x)
        b0 = _ConvBN(320, (3, 3), (2, 2), "VALID", dtype=d, name="b0b")(b0)
        b1 = _ConvBN(192, (1, 1), dtype=d, name="b1a")(x)
        b1 = _ConvBN(192, (1, 7), dtype=d, name="b1b")(b1)
        b1 = _ConvBN(192, (7, 1), dtype=d, name="b1c")(b1)
        b1 = _ConvBN(192, (3, 3), (2, 2), "VALID", dtype=d, name="b1d")(b1)
        b2 = _pool(x, "max", (3, 3), (2, 2), "VALID")
        return jnp.concatenate([b0, b1, b2], axis=-1)


class _MixedC(nn.Module):
    """8×8 block (Mixed_7b/7c) with split branches."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = self.dtype
        b0 = _ConvBN(320, (1, 1), dtype=d, name="b0")(x)
        b1 = _ConvBN(384, (1, 1), dtype=d, name="b1a")(x)
        b1 = jnp.concatenate(
            [
                _ConvBN(384, (1, 3), dtype=d, name="b1b")(b1),
                _ConvBN(384, (3, 1), dtype=d, name="b1c")(b1),
            ],
            axis=-1,
        )
        b2 = _ConvBN(448, (1, 1), dtype=d, name="b2a")(x)
        b2 = _ConvBN(384, (3, 3), dtype=d, name="b2b")(b2)
        b2 = jnp.concatenate(
            [
                _ConvBN(384, (1, 3), dtype=d, name="b2c")(b2),
                _ConvBN(384, (3, 1), dtype=d, name="b2d")(b2),
            ],
            axis=-1,
        )
        b3 = _pool(x, "avg")
        b3 = _ConvBN(192, (1, 1), dtype=d, name="b3")(b3)
        return jnp.concatenate([b0, b1, b2, b3], axis=-1)


class InceptionV3(nn.Module):
    """TF-slim InceptionV3: images in [-1, 1] → (pool3 features, logits)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> Tuple[jax.Array, jax.Array]:
        d = self.dtype
        x = x.astype(d)
        x = _ConvBN(32, (3, 3), (2, 2), "VALID", dtype=d, name="Conv2d_1a")(x)
        x = _ConvBN(32, (3, 3), padding="VALID", dtype=d, name="Conv2d_2a")(x)
        x = _ConvBN(64, (3, 3), dtype=d, name="Conv2d_2b")(x)
        x = _pool(x, "max", (3, 3), (2, 2), "VALID")
        x = _ConvBN(80, (1, 1), padding="VALID", dtype=d, name="Conv2d_3b")(x)
        x = _ConvBN(192, (3, 3), padding="VALID", dtype=d, name="Conv2d_4a")(x)
        x = _pool(x, "max", (3, 3), (2, 2), "VALID")
        x = _MixedA(32, dtype=d, name="Mixed_5b")(x)
        x = _MixedA(64, dtype=d, name="Mixed_5c")(x)
        x = _MixedA(64, dtype=d, name="Mixed_5d")(x)
        x = _ReductionA(dtype=d, name="Mixed_6a")(x)
        x = _MixedB(128, dtype=d, name="Mixed_6b")(x)
        x = _MixedB(160, dtype=d, name="Mixed_6c")(x)
        x = _MixedB(160, dtype=d, name="Mixed_6d")(x)
        x = _MixedB(192, dtype=d, name="Mixed_6e")(x)
        x = _ReductionB(dtype=d, name="Mixed_7a")(x)
        x = _MixedC(dtype=d, name="Mixed_7b")(x)
        x = _MixedC(dtype=d, name="Mixed_7c")(x)
        features = jnp.mean(x, axis=(1, 2)).astype(jnp.float32)  # pool3 [B, 2048]
        logits = nn.Dense(NUM_LOGITS, dtype=jnp.float32, name="logits")(features)
        return features, logits


def preprocess(images: jax.Array) -> jax.Array:
    """Generator output ([B,H,W,3] in [-1,1]) → 299×299 Inception input."""
    return jax.image.resize(
        images.astype(jnp.float32),
        (images.shape[0], 299, 299, 3),
        method="bilinear",
    )


def load_params(
    weights_path: Optional[str] = None, seed: int = 0
) -> Tuple[Any, bool]:
    """Returns ``(params, pretrained)``.

    ``pretrained`` is False when falling back to the deterministic random
    init (no weights file found) — callers should tag FID/IS numbers as
    ``fid_random_features`` in that case.
    """
    weights_path = weights_path or os.environ.get("BIGGAN_TPU_INCEPTION_WEIGHTS")
    model = InceptionV3()
    dummy = jnp.zeros((1, 299, 299, 3), jnp.float32)
    if weights_path and os.path.exists(weights_path):
        import flax.traverse_util as tu

        loaded = np.load(weights_path)
        flat = {k: jnp.asarray(v) for k, v in loaded.items()}
        tree = tu.unflatten_dict({tuple(k.split("/")): v for k, v in flat.items()})
        params = {"params": tree.get("params", tree)}
        # validate against the model's structure/shapes up front — a stale
        # or mismatched weights file must fail loudly here, not deep inside
        # a jitted apply (or worse, silently skew FID)
        expected = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(seed), dummy))
        exp_flat = tu.flatten_dict(expected, sep="/")
        got_flat = tu.flatten_dict(params, sep="/")
        missing = sorted(set(exp_flat) - set(got_flat))
        extra = sorted(set(got_flat) - set(exp_flat))
        bad_shapes = sorted(
            k for k in exp_flat.keys() & got_flat.keys()
            if tuple(exp_flat[k].shape) != tuple(got_flat[k].shape)
        )
        if missing or extra or bad_shapes:
            raise ValueError(
                f"inception weights at {weights_path!r} do not match the model: "
                f"missing={missing[:5]} extra={extra[:5]} bad_shapes={bad_shapes[:5]} "
                "(convert with biggan_tpu.eval.convert_inception)"
            )
        return params, True
    return model.init(jax.random.PRNGKey(seed), dummy), False


def make_feature_fn(params, batch_dtype=jnp.float32):
    """Jitted ``images[-1,1] → (features[B,2048], probs[B,1008])``."""
    model = InceptionV3(dtype=batch_dtype)

    @jax.jit
    def feature_fn(images):
        feats, logits = model.apply(params, preprocess(images))
        return feats, jax.nn.softmax(logits, axis=-1)

    return feature_fn
