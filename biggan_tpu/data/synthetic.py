"""Synthetic data source — deterministic random images for tests/benchmarks.

The reference has no synthetic mode (it globs ``./dataset/<name>/*.*``,
ref utils.py:~33-38); this exists so every train/bench path runs without a
dataset on disk (SURVEY.md §7 build order step 2).
"""

from __future__ import annotations

import numpy as np


class SyntheticSource:
    """Infinite stream of uint8 images (+ labels when num_classes>0).

    uint8 to match :class:`~biggan_tpu.data.pipeline.ImageFolderSource`'s
    contract — every source feeds the same device-side preprocess.
    """

    def __init__(self, img_size: int, num_classes: int = 0, seed: int = 0):
        import threading

        self.img_size = img_size
        self.num_classes = num_classes
        self.seed = seed
        self._rng = np.random.RandomState(seed)
        # batch() is called from PrefetchLoader worker threads and
        # RandomState is not thread-safe; generation is cheap, lock it all.
        self._rng_lock = threading.Lock()

    def __len__(self) -> int:
        return 50_000  # nominal epoch size

    def batch(self, n: int) -> dict:
        with self._rng_lock:
            out = {
                "image": self._rng.randint(
                    0, 256, size=(n, self.img_size, self.img_size, 3)
                ).astype(np.uint8)
            }
            if self.num_classes > 0:
                out["label"] = self._rng.randint(
                    0, self.num_classes, size=(n,)
                ).astype(np.int32)
        return out

    def batch_at(self, positions: np.ndarray) -> dict:
        """Position-based protocol (multi-host / ordered loader): the
        image at global position p is a pure function of (seed, p) —
        counter-hashed bytes, so every process materializes its slice of
        the same global batch with no shared cursor. A different stream
        than the stateful :meth:`batch` RandomState draw (both are just
        noise; determinism is the contract, not stream equality)."""
        from biggan_tpu.data.pipeline import splitmix64_at

        positions = np.asarray(positions, np.int64)
        n = len(positions)
        s = self.img_size
        nbytes = s * s * 3
        words = (nbytes + 7) // 8
        # one u64 word per (position, word-index) counter
        ctr = positions[:, None].astype(np.uint64) * np.uint64(words) + np.arange(
            words, dtype=np.uint64
        )[None, :]
        z = splitmix64_at(self.seed, ctr)
        img = np.ascontiguousarray(z).view(np.uint8)[:, :nbytes]
        out = {"image": img.reshape(n, s, s, 3).copy()}
        if self.num_classes > 0:
            out["label"] = (
                splitmix64_at(self.seed ^ 0x5F5F5F5F, positions)
                % np.uint64(self.num_classes)
            ).astype(np.int32)
        return out
