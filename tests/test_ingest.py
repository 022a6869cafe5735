"""CIFAR-10 ingestion: synthetic archive → class-subdir PNG layout."""

import os
import pickle
import tarfile

import numpy as np
import pytest

PIL = pytest.importorskip("PIL")

from biggan_tpu.data.ingest import CIFAR10_CLASSES, ingest_cifar10  # noqa: E402


def _make_archive(tmp_path, n=20):
    rng = np.random.RandomState(0)
    data = rng.randint(0, 256, (n, 3 * 32 * 32), np.uint8)
    labels = list(rng.randint(0, 10, n))
    batch = {b"data": data, b"labels": labels}
    raw = tmp_path / "cifar-10-batches-py"
    raw.mkdir()
    with open(raw / "data_batch_1", "wb") as f:
        pickle.dump(batch, f)
    tar_path = tmp_path / "cifar-10-python.tar.gz"
    with tarfile.open(tar_path, "w:gz") as tar:
        tar.add(raw / "data_batch_1", arcname="cifar-10-batches-py/data_batch_1")
    return tar_path, raw, labels


def test_ingest_from_tar_and_dir(tmp_path):
    tar_path, raw_dir, labels = _make_archive(tmp_path)

    out1 = tmp_path / "from_tar"
    assert ingest_cifar10(str(tar_path), str(out1)) == 20
    out2 = tmp_path / "from_dir"
    assert ingest_cifar10(str(raw_dir), str(out2)) == 20

    for out in (out1, out2):
        pngs = [p for c in CIFAR10_CLASSES for p in (out / c).glob("*.png") if (out / c).exists()]
        assert len(pngs) == 20
        # layout is consumable by the pipeline source, with correct classes
        from biggan_tpu.data.pipeline import ImageFolderSource

        src = ImageFolderSource(str(out), img_size=32)
        assert src.num_classes == len([c for c in CIFAR10_CLASSES if (out / c).exists()])
        b = src.batch(4)
        assert b["image"].shape == (4, 32, 32, 3)


def test_ingest_empty_raises(tmp_path):
    empty = tmp_path / "empty"
    empty.mkdir()
    with pytest.raises(FileNotFoundError):
        ingest_cifar10(str(empty), str(tmp_path / "out"))
