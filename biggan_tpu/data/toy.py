"""Procedural structured image dataset ("toy shapes") for learning demos.

Zero-egress hosts have no CIFAR-10 archive to ingest (``data/ingest.py``
covers the connected-machine path), so this generates a *learnable* stand-in
with real statistical structure: 10 classes = (shape, hue) combinations
rendered with pose/scale/brightness jitter over textured backgrounds. A GAN
trained on it must learn per-class color and shape placement — enough
signal for loss curves, improving sample grids, and a falling FID trend
(``RESULTS.md``), unlike pure-noise synthetic batches.

Layout matches the pipeline's expectation (``dataset/<name>/<class>/*.png``).
"""

from __future__ import annotations

import os
from typing import Tuple

import numpy as np

# (shape, hue) per class — hue as RGB base color
CLASSES: Tuple[Tuple[str, Tuple[int, int, int]], ...] = (
    ("disk", (220, 60, 60)),
    ("disk", (60, 220, 60)),
    ("square", (60, 60, 220)),
    ("square", (220, 220, 60)),
    ("ring", (220, 60, 220)),
    ("ring", (60, 220, 220)),
    ("cross", (240, 140, 40)),
    ("cross", (140, 40, 240)),
    ("stripe", (40, 240, 140)),
    ("stripe", (200, 200, 200)),
)


def render(class_idx: int, rng: np.random.Generator, size: int = 32) -> np.ndarray:
    """One uint8 [size,size,3] sample of the class with pose/scale jitter."""
    shape, color = CLASSES[class_idx]
    # textured dark background
    img = rng.normal(28, 9, (size, size, 3))
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float64)
    cy, cx = rng.uniform(0.32, 0.68, 2) * size
    r = rng.uniform(0.18, 0.32) * size
    brightness = rng.uniform(0.7, 1.15)
    col = np.asarray(color, np.float64) * brightness

    if shape == "disk":
        mask = (yy - cy) ** 2 + (xx - cx) ** 2 <= r * r
    elif shape == "square":
        mask = (np.abs(yy - cy) <= r * 0.9) & (np.abs(xx - cx) <= r * 0.9)
    elif shape == "ring":
        d2 = (yy - cy) ** 2 + (xx - cx) ** 2
        mask = (d2 <= r * r) & (d2 >= (0.55 * r) ** 2)
    elif shape == "cross":
        w = max(r * 0.35, 1.5)
        mask = ((np.abs(yy - cy) <= w) & (np.abs(xx - cx) <= r)) | (
            (np.abs(xx - cx) <= w) & (np.abs(yy - cy) <= r)
        )
    else:  # stripe: diagonal band through (cy, cx)
        w = max(r * 0.45, 2.0)
        mask = np.abs((yy - cy) - (xx - cx)) <= w
    img[mask] = col + rng.normal(0, 6, (int(mask.sum()), 3))
    return np.clip(img, 0, 255).astype(np.uint8)


def make_toy_dataset(
    out_root: str = "dataset/toyshapes",
    n_per_class: int = 500,
    img_size: int = 32,
    seed: int = 0,
) -> int:
    """Write the dataset as class-subdir PNGs; returns total image count.
    Idempotent: skips generation when the expected files already exist."""
    from PIL import Image

    total = 0
    for idx, (shape, _) in enumerate(CLASSES):
        d = os.path.join(out_root, f"{idx}_{shape}")
        os.makedirs(d, exist_ok=True)
        wanted = {f"{i:05d}.png" for i in range(n_per_class)}
        # prune stale generated files (e.g. a previous larger n_per_class)
        # so the on-disk dataset always matches the reported count
        for name in os.listdir(d):
            if name.endswith(".png") and name not in wanted:
                os.remove(os.path.join(d, name))
        for i in range(n_per_class):
            p = os.path.join(d, f"{i:05d}.png")
            if not os.path.exists(p):
                rng = np.random.default_rng((seed, idx, i))  # per-image stream
                Image.fromarray(render(idx, rng, img_size)).save(p)
            total += 1
    return total


if __name__ == "__main__":
    import sys

    out = sys.argv[1] if len(sys.argv) > 1 else "dataset/toyshapes"
    n = make_toy_dataset(out)
    print(f"wrote {n} images under {out}")
