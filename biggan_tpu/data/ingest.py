"""Dataset ingestion: materialize standard archives into the on-disk
layout the pipeline globs (``dataset/<name>/<class>/*.png``).

The reference consumes bare image folders (``./dataset/<name>/*.*``,
ref utils.py:~33-38) and leaves obtaining them to the user. This tool
closes that gap for CIFAR-10 (the ``biggan32_cifar10`` preset): point it
at the standard ``cifar-10-python.tar.gz`` (or its extracted
``cifar-10-batches-py`` directory) from a connected machine and it writes
class-subdir PNGs that :class:`~biggan_tpu.data.pipeline.ImageFolderSource`
(and the native C++ loader) consume directly.

    python -m biggan_tpu.data.ingest cifar10 /path/to/cifar-10-python.tar.gz
    python main.py --config biggan32_cifar10 --phase train
"""

from __future__ import annotations

import os
import pickle
import sys
import tarfile
from typing import Iterable, Tuple

import numpy as np

CIFAR10_CLASSES = (
    "airplane", "automobile", "bird", "cat", "deer",
    "dog", "frog", "horse", "ship", "truck",
)


def _cifar_batches_from_tar(path: str) -> Iterable[Tuple[np.ndarray, np.ndarray]]:
    with tarfile.open(path, "r:*") as tar:
        for member in tar.getmembers():
            base = os.path.basename(member.name)
            if base.startswith("data_batch") or base == "test_batch":
                f = tar.extractfile(member)
                if f is None:
                    continue
                yield _decode_batch(pickle.load(f, encoding="bytes"))


def _cifar_batches_from_dir(path: str) -> Iterable[Tuple[np.ndarray, np.ndarray]]:
    for name in sorted(os.listdir(path)):
        if name.startswith("data_batch") or name == "test_batch":
            with open(os.path.join(path, name), "rb") as f:
                yield _decode_batch(pickle.load(f, encoding="bytes"))


def _decode_batch(d: dict) -> Tuple[np.ndarray, np.ndarray]:
    data = np.asarray(d[b"data"], np.uint8).reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1)
    labels = np.asarray(d[b"labels"], np.int32)
    return data, labels


def ingest_cifar10(src: str, out_root: str = "dataset/cifar10") -> int:
    """Write CIFAR-10 as ``out_root/<class>/<idx>.png``; returns image count."""
    from PIL import Image

    batches = (
        _cifar_batches_from_tar(src)
        if os.path.isfile(src)
        else _cifar_batches_from_dir(src)
    )
    counts = [0] * len(CIFAR10_CLASSES)
    total = 0
    for images, labels in batches:
        for img, label in zip(images, labels):
            cls = CIFAR10_CLASSES[int(label)]
            d = os.path.join(out_root, cls)
            os.makedirs(d, exist_ok=True)
            Image.fromarray(img).save(os.path.join(d, f"{counts[label]:05d}.png"))
            counts[label] += 1
            total += 1
    if total == 0:
        raise FileNotFoundError(
            f"no CIFAR-10 batches found in {src!r} "
            "(expected cifar-10-python.tar.gz or the extracted batches dir)"
        )
    return total


def main(argv=None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    if len(argv) < 2 or argv[0] != "cifar10":
        print(__doc__)
        return 2
    out = argv[2] if len(argv) > 2 else "dataset/cifar10"
    n = ingest_cifar10(argv[1], out)
    print(f"wrote {n} images under {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
