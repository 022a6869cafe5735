"""Native C++ data loader: build, decode parity vs PIL, pipeline wiring."""

import numpy as np
import pytest

PIL = pytest.importorskip("PIL")
from PIL import Image  # noqa: E402


def _write_images(root, n_per_class=3, classes=("cat", "dog"), size=40):
    rng = np.random.RandomState(0)
    paths = []
    for c in classes:
        d = root / c
        d.mkdir(parents=True)
        for i in range(n_per_class):
            arr = rng.randint(0, 256, (size, size + 8, 3), np.uint8)
            img = Image.fromarray(arr)
            if i % 2 == 0:
                p = d / f"img_{i}.jpg"
                img.save(p, quality=95)
            else:
                p = d / f"img_{i}.png"
                img.save(p)
            paths.append(str(p))
    return paths


@pytest.fixture(scope="module")
def native_available():
    from biggan_tpu.data import native_loader

    if not native_loader.available():
        pytest.skip("native loader toolchain unavailable")
    return True


def test_native_loader_batches(tmp_path, native_available):
    from biggan_tpu.data.native_loader import NativeImageFolderSource

    _write_images(tmp_path)
    from biggan_tpu.data.pipeline import ImageFolderSource

    src = ImageFolderSource(str(tmp_path), img_size=16)
    nsrc = NativeImageFolderSource(
        src.files, src.labels, img_size=16, batch=8, seed=1
    )
    try:
        b = nsrc.batch(8)
        assert b["image"].shape == (8, 16, 16, 3)
        assert b["image"].dtype == np.uint8
        assert b["label"].shape == (8,)
        assert set(np.unique(b["label"])).issubset({0, 1})
        # images are real decodes, not zeros
        assert b["image"].std() > 10
        # a second batch differs (random sampling advances)
        b2 = nsrc.batch(8)
        assert not np.array_equal(b["image"], b2["image"])
    finally:
        nsrc.close()


def test_native_decode_matches_pil(tmp_path, native_available):
    """Same file, same target size: native bilinear ≈ PIL bilinear."""
    from biggan_tpu.data.native_loader import NativeImageFolderSource

    rng = np.random.RandomState(3)
    arr = rng.randint(0, 256, (64, 64, 3), np.uint8)
    p = tmp_path / "one.png"  # png: lossless, isolates the resize math
    Image.fromarray(arr).save(p)

    nsrc = NativeImageFolderSource([str(p)], None, img_size=32, batch=2, seed=0)
    try:
        native_img = nsrc.batch(2)["image"][0].astype(np.float32)
    finally:
        nsrc.close()
    pil_img = np.asarray(
        Image.fromarray(arr).resize((32, 32), Image.BILINEAR), dtype=np.float32
    )
    # same half-pixel bilinear convention → small rounding differences only
    assert np.mean(np.abs(native_img - pil_img)) < 2.0
    assert np.max(np.abs(native_img - pil_img)) <= 16.0


def test_native_decode_pool_matches_pil_traversal(tmp_path, native_available):
    """The multi-host ordered path's native decode: pool.decode over the
    source's position-based indices must equal the PIL batch_at decode
    (same files, same order, same bilinear convention ±rounding)."""
    from biggan_tpu.data.native_loader import NativeDecodePool
    from biggan_tpu.data.pipeline import ImageFolderSource

    _write_images(tmp_path)
    src = ImageFolderSource(str(tmp_path), img_size=16, seed=7)
    pool = NativeDecodePool(src.files, src.labels, img_size=16)
    positions = np.arange(2 * len(src))  # two full epochs
    native = pool.decode(src.indices_at(positions))
    pil = src.batch_at(positions)
    np.testing.assert_array_equal(native["label"], pil["label"])  # same files
    diff = np.abs(native["image"].astype(np.float32) - pil["image"].astype(np.float32))
    assert np.mean(diff) < 2.0 and np.max(diff) <= 16.0


def test_sharded_loader_routes_native_pool(tmp_path, native_available):
    """make_loader(shard=...) on an image folder uses the native decode
    pool while preserving the deterministic global traversal (ordered
    hand-out, position-pure batches)."""
    from biggan_tpu.data.pipeline import ImageFolderSource, make_loader

    _write_images(tmp_path)
    src = ImageFolderSource(str(tmp_path), img_size=16, seed=5)
    from biggan_tpu.data.native_loader import NativeDecodePool

    loader = make_loader(src, batch_size=3, n_critic=1, shard=(0, 1), seed=5)
    try:
        # really the pool closure, not the source's PIL batch_at fallback
        assert loader._batch_at is not src.batch_at
        assert isinstance(loader._batch_at.__defaults__[0], NativeDecodePool)
        got = np.concatenate([next(loader)["label"].reshape(-1) for _ in range(2)])
    finally:
        loader.close()
    expected = src.labels[src.indices_at(np.arange(6))]
    np.testing.assert_array_equal(got, expected)


def test_make_loader_uses_native(tmp_path, native_available):
    from biggan_tpu.data.pipeline import (
        ImageFolderSource,
        _NativeLoaderAdapter,
        make_loader,
    )

    _write_images(tmp_path)
    src = ImageFolderSource(str(tmp_path), img_size=16)
    loader = make_loader(src, batch_size=4, n_critic=2)
    try:
        assert isinstance(loader, _NativeLoaderAdapter)
        batch = next(loader)
        assert batch["image"].shape == (2, 4, 16, 16, 3)
        assert batch["label"].shape == (2, 4)
    finally:
        loader.close()

    off = make_loader(src, batch_size=4, n_critic=2, native="off")
    try:
        assert not isinstance(off, _NativeLoaderAdapter)
    finally:
        off.close()
