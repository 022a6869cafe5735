"""Fréchet Inception Distance — streaming statistics + stable distance.

New capability over the reference (which only eyeballs PNG grids;
SURVEY.md §2.3): FID@N between generator samples and a real-image set.

Design for TPU: activations stream through the jitted Inception forward in
fixed-size batches; only the running ``(n, Σx, Σxxᵀ)`` moments live on
host, so computing FID@50k holds at most one batch of images in HBM.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Iterable, Optional, Tuple

import numpy as np


@dataclass
class StreamingMoments:
    """Running first/second moments of feature vectors."""

    dim: int

    def __post_init__(self):
        self.n = 0
        self.sum = np.zeros(self.dim, np.float64)
        self.sum_outer = np.zeros((self.dim, self.dim), np.float64)

    def update(self, feats: np.ndarray) -> None:
        feats = np.asarray(feats, np.float64)
        self.n += feats.shape[0]
        self.sum += feats.sum(axis=0)
        self.sum_outer += feats.T @ feats

    def finalize(self) -> Tuple[np.ndarray, np.ndarray]:
        if self.n < 2:
            raise ValueError("need at least 2 samples for covariance")
        mu = self.sum / self.n
        cov = (self.sum_outer - self.n * np.outer(mu, mu)) / (self.n - 1)
        return mu, cov


def frechet_distance(
    mu1: np.ndarray, cov1: np.ndarray, mu2: np.ndarray, cov2: np.ndarray,
    eps: float = 1e-6,
) -> float:
    """‖μ1−μ2‖² + tr(C1 + C2 − 2·(C1·C2)^½), with the standard jitter
    fallback when the covariance product is near-singular."""
    from scipy import linalg

    def _sqrtm(a):
        # scipy deprecates/removes the ``disp`` argument (gone in 1.18)
        # and with it the (sqrtm, errest) tuple return — accept both ABIs
        out = linalg.sqrtm(a)
        return out[0] if isinstance(out, tuple) else out

    diff = mu1 - mu2
    covmean = _sqrtm(cov1 @ cov2)
    if not np.isfinite(covmean).all():
        offset = np.eye(cov1.shape[0]) * eps
        covmean = _sqrtm((cov1 + offset) @ (cov2 + offset))
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(diff @ diff + np.trace(cov1) + np.trace(cov2) - 2 * np.trace(covmean))


def compute_statistics(
    batches: Iterable[np.ndarray],
    feature_fn: Callable,
    max_samples: Optional[int] = None,
    dim: int = 2048,
) -> Tuple[np.ndarray, np.ndarray]:
    """Stream image batches ([B,H,W,3] in [-1,1]) → (mu, cov)."""
    moments = StreamingMoments(dim)
    for batch in batches:
        feats, _ = feature_fn(batch)
        feats = np.asarray(feats)
        if max_samples is not None and moments.n + feats.shape[0] > max_samples:
            feats = feats[: max_samples - moments.n]
        moments.update(feats)
        if max_samples is not None and moments.n >= max_samples:
            break
    return moments.finalize()


def compute_fid(
    real_batches: Iterable[np.ndarray],
    fake_batches: Iterable[np.ndarray],
    feature_fn: Callable,
    max_samples: Optional[int] = 50_000,
) -> float:
    mu_r, cov_r = compute_statistics(real_batches, feature_fn, max_samples)
    mu_f, cov_f = compute_statistics(fake_batches, feature_fn, max_samples)
    return frechet_distance(mu_r, cov_r, mu_f, cov_f)
