"""Inception Score — exp(E_x KL(p(y|x) ‖ p(y))) over splits.

New capability over the reference (SURVEY.md §2.3). Uses the same
streaming Inception forward as :mod:`biggan_tpu.eval.fid`; only the
per-image class posteriors are kept on host.
"""

from __future__ import annotations

from typing import Callable, Iterable, Optional, Tuple

import numpy as np


def inception_score_from_probs(
    probs: np.ndarray, splits: int = 10
) -> Tuple[float, float]:
    """probs: [N, num_classes] softmax outputs → (mean IS, std over splits)."""
    probs = np.asarray(probs, np.float64)
    n = probs.shape[0]
    scores = []
    for part in np.array_split(probs, splits):
        if part.shape[0] == 0:
            continue
        marginal = part.mean(axis=0, keepdims=True)
        kl = part * (np.log(part + 1e-16) - np.log(marginal + 1e-16))
        scores.append(np.exp(kl.sum(axis=1).mean()))
    return float(np.mean(scores)), float(np.std(scores))


def compute_inception_score(
    batches: Iterable[np.ndarray],
    feature_fn: Callable,
    max_samples: Optional[int] = 50_000,
    splits: int = 10,
) -> Tuple[float, float]:
    """Stream image batches ([B,H,W,3] in [-1,1]) → (IS mean, IS std)."""
    chunks, seen = [], 0
    for batch in batches:
        _, probs = feature_fn(batch)
        probs = np.asarray(probs)
        if max_samples is not None and seen + probs.shape[0] > max_samples:
            probs = probs[: max_samples - seen]
        chunks.append(probs)
        seen += probs.shape[0]
        if max_samples is not None and seen >= max_samples:
            break
    return inception_score_from_probs(np.concatenate(chunks, axis=0), splits)
