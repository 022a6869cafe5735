"""End-to-end eval harness: FID@N and Inception Score for a trained GAN.

``python main.py --phase eval`` restores the EMA generator and reports
both metrics against the configured dataset (new capability — the
reference has no quantitative eval, SURVEY.md §2.3).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np

from biggan_tpu.eval.fid import StreamingMoments, frechet_distance
from biggan_tpu.eval.inception import FEATURE_DIM, load_params, make_feature_fn
from biggan_tpu.eval.inception_score import inception_score_from_probs


def evaluate_gan(
    gan,
    num_samples: int = 10_000,
    batch_size: int = 64,
    weights_path: Optional[str] = None,
    seed: int = 0,
) -> dict:
    """Compute FID (fake vs dataset) and IS for ``gan`` (a built BigGAN).

    Streams both sides through one jitted Inception forward; peak HBM is
    one batch of 299×299 images plus the feature net.
    """
    cfg = gan.cfg
    params, pretrained = load_params(weights_path, seed)
    feature_fn = make_feature_fn(params)

    from biggan_tpu.data.pipeline import make_dataset

    source = make_dataset(
        cfg.dataset, cfg.img_size, cfg.num_classes, seed, data_root=cfg.data_root
    )

    real_m = StreamingMoments(FEATURE_DIM)
    fake_m = StreamingMoments(FEATURE_DIM)
    probs_chunks = []

    rng = jax.random.PRNGKey(seed)
    seen = 0
    while seen < num_samples:
        n = min(batch_size, num_samples - seen)
        # always run full batches (pad the final ragged one) so the jitted
        # Inception forward and the sampler compile exactly once; only the
        # first n rows feed the moments.
        real = source.batch(batch_size)["image"].astype(np.float32) / 127.5 - 1.0
        feats, _ = feature_fn(real)
        real_m.update(np.asarray(feats)[:n])

        rng, z_rng, l_rng = jax.random.split(rng, 3)
        fake = gan.sample(batch_size, rng=z_rng, label_rng=l_rng)
        feats, probs = feature_fn(fake)
        fake_m.update(np.asarray(feats)[:n])
        probs_chunks.append(np.asarray(probs)[:n])
        seen += n

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
    }
