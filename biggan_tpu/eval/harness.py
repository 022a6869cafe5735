"""End-to-end eval harness: FID@N and Inception Score for a trained GAN.

``python main.py --phase eval`` restores the EMA generator and reports
both metrics against the configured dataset (new capability — the
reference has no quantitative eval, SURVEY.md §2.3).

Real-FID-at-50k readiness: the real side decodes through the native C++
loader pool when available (the PIL path is host-bound at 299 px), the
eval batch size follows ``cfg.batch_size`` (capped at 64) unless
overridden, and fake
labels are drawn from the *dataset's class marginal* — uniform fake labels
against a skewed real set would bias conditional FID.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np

from biggan_tpu.eval.fid import StreamingMoments, frechet_distance
from biggan_tpu.eval.inception import FEATURE_DIM, load_params, make_feature_fn
from biggan_tpu.eval.inception_score import inception_score_from_probs


def _class_marginal(source, num_classes: int) -> Optional[np.ndarray]:
    labels = getattr(source, "labels", None)
    if num_classes <= 0 or labels is None:
        return None
    counts = np.bincount(np.asarray(labels), minlength=num_classes).astype(np.float64)
    return counts / counts.sum()


def _native_real_source(source, batch_size: int, seed: int):
    """C++ decode pool for the real side when the dataset is on disk."""
    from biggan_tpu.data import native_loader
    from biggan_tpu.data.pipeline import ImageFolderSource

    if not isinstance(source, ImageFolderSource) or not native_loader.available():
        return source, None
    nsrc = native_loader.NativeImageFolderSource(
        source.files,
        source.labels if source.labels is not None else None,
        source.img_size,
        batch_size,
        seed=seed,
        sampling=source.sampling,
    )
    return nsrc, nsrc


def evaluate_gan(
    gan,
    num_samples: int = 10_000,
    batch_size: Optional[int] = None,
    weights_path: Optional[str] = None,
    seed: int = 0,
) -> dict:
    """Compute FID (fake vs dataset) and IS for ``gan`` (a built BigGAN).

    Streams both sides through one jitted Inception forward; peak HBM is
    one batch of 299×299 images plus the feature net. ``batch_size``
    defaults to ``min(cfg.batch_size, 64)`` — following the training
    batch, but capped so evaluating a pod-preset checkpoint (batch 256+
    at 512 px) on a single host doesn't multiply peak eval memory; pass
    ``batch_size`` explicitly to override.
    """
    cfg = gan.cfg
    batch_size = min(cfg.batch_size, 64) if batch_size is None else batch_size
    params, pretrained = load_params(weights_path, seed)
    feature_fn = make_feature_fn(params)

    from biggan_tpu.data.pipeline import make_dataset

    source = make_dataset(
        cfg.dataset, cfg.img_size, cfg.num_classes, seed, data_root=cfg.data_root
    )
    marginal = _class_marginal(source, cfg.num_classes)
    real_src, native = _native_real_source(source, batch_size, seed)

    real_m = StreamingMoments(FEATURE_DIM)
    fake_m = StreamingMoments(FEATURE_DIM)
    probs_chunks = []

    rng = jax.random.PRNGKey(seed)
    label_rng = np.random.default_rng(seed)
    seen = 0
    try:
        while seen < num_samples:
            n = min(batch_size, num_samples - seen)
            # always run full batches (pad the final ragged one) so the jitted
            # Inception forward and the sampler compile exactly once; only the
            # first n rows feed the moments.
            real = real_src.batch(batch_size)["image"].astype(np.float32) / 127.5 - 1.0
            feats, _ = feature_fn(real)
            real_m.update(np.asarray(feats)[:n])

            rng, z_rng = jax.random.split(rng)
            labels = None
            if marginal is not None:
                labels = jax.numpy.asarray(
                    label_rng.choice(cfg.num_classes, size=batch_size, p=marginal),
                    dtype=jax.numpy.int32,
                )
            fake = gan.sample(batch_size, rng=z_rng, labels=labels)
            feats, probs = feature_fn(fake)
            fake_m.update(np.asarray(feats)[:n])
            probs_chunks.append(np.asarray(probs)[:n])
            seen += n
    finally:
        if native is not None:
            native.close()

    mu_r, cov_r = real_m.finalize()
    mu_f, cov_f = fake_m.finalize()
    fid = frechet_distance(mu_r, cov_r, mu_f, cov_f)
    is_mean, is_std = inception_score_from_probs(np.concatenate(probs_chunks))

    tag = "" if pretrained else "_random_features"
    return {
        f"fid{tag}": fid,
        f"inception_score{tag}": is_mean,
        f"inception_score{tag}_std": is_std,
        "num_samples": seen,
        "pretrained_inception": pretrained,
        "native_real_decode": native is not None,
    }
