"""Epoch-shuffle traversal: each file exactly once per epoch, resumable.

The reference does shuffled full passes (``shuffle_and_repeat``,
ref BigGAN_128.py:~188-194) and resumes epoch/idx from the checkpoint
counter (:~272-278). Covers the Python source and the native C++ loader.
"""

import numpy as np
import pytest

PIL = pytest.importorskip("PIL")
from PIL import Image  # noqa: E402

from biggan_tpu.data.pipeline import ImageFolderSource  # noqa: E402


@pytest.fixture
def flat_dataset(tmp_path):
    rng = np.random.RandomState(0)
    for i in range(7):  # deliberately not a divisor of any batch size
        arr = rng.randint(0, 256, (8, 8, 3), np.uint8)
        Image.fromarray(arr).save(tmp_path / f"img_{i}.png")
    return tmp_path


def _index_source(root, **kw):
    """Source whose 'images' encode the file index — traversal is observable."""
    src = ImageFolderSource(str(root), img_size=4, **kw)
    files = sorted(src.files)
    src.files = files
    src._load = lambda path: np.full((4, 4, 3), files.index(path), np.uint8)
    return src


def test_epoch_visits_each_file_exactly_once(flat_dataset):
    src = _index_source(flat_dataset, sampling="shuffle")
    n = len(src)
    ids = src.batch(n)["image"][:, 0, 0, 0]
    assert sorted(ids.tolist()) == list(range(n))  # a full permutation
    # second epoch: again exactly once each, in a different order
    ids2 = src.batch(n)["image"][:, 0, 0, 0]
    assert sorted(ids2.tolist()) == list(range(n))
    assert ids.tolist() != ids2.tolist()


def test_epoch_boundary_spanning_batches(flat_dataset):
    """Batches that straddle the epoch boundary still give exact coverage."""
    src = _index_source(flat_dataset, sampling="shuffle")
    n = len(src)
    seen = np.concatenate(
        [src.batch(3)["image"][:, 0, 0, 0] for _ in range((2 * n) // 3 + 1)]
    )[: 2 * n]
    counts = np.bincount(seen, minlength=n)
    assert (counts == 2).all()  # two epochs → each file exactly twice


def test_seek_resumes_traversal(flat_dataset):
    src = _index_source(flat_dataset, sampling="shuffle", seed=5)
    consumed = np.concatenate([src.batch(3)["image"][:, 0, 0, 0] for _ in range(4)])

    fresh = _index_source(flat_dataset, sampling="shuffle", seed=5)
    fresh.seek(6)  # two batches in
    resumed = np.concatenate([fresh.batch(3)["image"][:, 0, 0, 0] for _ in range(2)])
    np.testing.assert_array_equal(resumed, consumed[6:12])


def test_iid_mode_keeps_replacement_semantics(flat_dataset):
    src = _index_source(flat_dataset, sampling="iid")
    n = len(src)
    # 8 epochs worth of draws virtually guarantees a repeat within some epoch
    ids = np.concatenate([src.batch(n)["image"][:, 0, 0, 0] for _ in range(8)])
    counts = np.bincount(ids, minlength=n)
    assert not (counts == 8).all()  # with-replacement ≠ exact coverage


def test_batch_at_matches_stateful_traversal(flat_dataset):
    """The position-based protocol (multi-host feed) follows the EXACT
    same file order as the stateful batch() cursor for shuffle sampling —
    single-host and multi-host runs of the same seed see the same data."""
    src = _index_source(flat_dataset, sampling="shuffle", seed=9)
    n = len(src)
    stateful = np.concatenate(
        [src.batch(3)["image"][:, 0, 0, 0] for _ in range(2 * n // 3 + 1)]
    )
    fresh = _index_source(flat_dataset, sampling="shuffle", seed=9)
    positional = fresh.batch_at(np.arange(len(stateful)))["image"][:, 0, 0, 0]
    np.testing.assert_array_equal(positional, stateful)


def test_batch_at_iid_is_deterministic_with_replacement(flat_dataset):
    src = _index_source(flat_dataset, sampling="iid", seed=3)
    n = len(src)
    a = src.indices_at(np.arange(8 * n))
    b = _index_source(flat_dataset, sampling="iid", seed=3).indices_at(np.arange(8 * n))
    np.testing.assert_array_equal(a, b)  # pure function of (seed, position)
    counts = np.bincount(a, minlength=n)
    assert not (counts == 8).all()  # with-replacement ≠ exact coverage


def test_sharded_loader_slices_assemble_the_global_batch(flat_dataset):
    """Two shards of a 2-process feed, concatenated, must equal the (0,1)
    single-shard feed's global batches row-for-row — the layout contract
    jax.make_array_from_process_local_data assembles on the mesh."""
    from biggan_tpu.data.pipeline import ShardedOrderedLoader

    def collect(shard, local_bs, n_batches, start=0):
        src = _index_source(flat_dataset, sampling="shuffle", seed=4)
        ld = ShardedOrderedLoader(
            src, (2, local_bs), shard=shard, start_count=start, workers=2
        )
        try:
            return [next(ld) for _ in range(n_batches)]
        finally:
            ld.close()

    whole = collect((0, 1), 4, 3)
    left = collect((0, 2), 2, 3)
    right = collect((1, 2), 2, 3)
    for w, l, r in zip(whole, left, right):
        np.testing.assert_array_equal(
            w["image"], np.concatenate([l["image"], r["image"]], axis=1)
        )

    # and the global traversal is still epoch-exact: 3 batches × G=8 = 24
    # draws ≡ images 0..23 of the traversal
    seen = np.concatenate([w["image"][:, :, 0, 0, 0].reshape(-1) for w in whole])
    n = 7  # files in flat_dataset
    counts = np.bincount(seen.astype(int), minlength=n)
    # 24 draws over 7 files: first 3 full epochs (21) + 3 of epoch 4
    assert counts.sum() == 24 and counts.min() >= 3 and counts.max() <= 4


def test_sharded_loader_start_count_resume(flat_dataset):
    from biggan_tpu.data.pipeline import ShardedOrderedLoader

    def run(start, n_batches):
        src = _index_source(flat_dataset, sampling="shuffle", seed=6)
        ld = ShardedOrderedLoader(src, (1, 4), shard=(0, 1), start_count=start)
        try:
            return np.concatenate(
                [next(ld)["image"][:, :, 0, 0, 0].reshape(-1) for _ in range(n_batches)]
            )
        finally:
            ld.close()

    full = run(0, 4)
    resumed = run(8, 2)  # resume two global batches in
    np.testing.assert_array_equal(resumed, full[8:])


def test_sharded_loader_rejects_misaligned_resume(flat_dataset):
    from biggan_tpu.data.pipeline import ShardedOrderedLoader

    src = _index_source(flat_dataset, sampling="shuffle")
    with pytest.raises(ValueError, match="step boundary"):
        ShardedOrderedLoader(src, (1, 4), shard=(0, 2), start_count=3)


def test_sharded_loader_propagates_decode_errors(flat_dataset):
    """A batch_at failure (corrupt file, dead pool) must surface at
    __next__ promptly — a silently-dead worker would hang the consumer
    (and in multi-host, every peer) forever."""
    from biggan_tpu.data.pipeline import ShardedOrderedLoader

    src = _index_source(flat_dataset, sampling="shuffle")

    def boom(positions):
        raise OSError("truncated file")

    ld = ShardedOrderedLoader(src, (1, 4), shard=(0, 1), batch_at=boom)
    try:
        with pytest.raises(RuntimeError, match="failed to build"):
            next(ld)
    finally:
        ld.close()


def test_validate_process_slice_contract():
    """The ordered loader's process-major layout assumption is CHECKED
    against the real sharding (a reordered mesh would otherwise silently
    permute global batches across hosts)."""
    import jax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from biggan_tpu.data.pipeline import validate_process_slice

    devs = jax.devices()[:8]
    proc_of = lambda d: 0 if devs.index(d) < 4 else 1  # pretend 2 processes

    mesh = Mesh(np.array(devs).reshape(8, 1), ("data", "model"))
    sh = NamedSharding(mesh, P(None, "data"))
    for p in (0, 1):  # process-major order: both processes validate
        validate_process_slice(sh, (2, 16), p, 2, proc_of=proc_of)

    # reversed device order: process 0's rows land in the TOP half — the
    # contract is violated and the check must say so
    rev = Mesh(np.array(devs[::-1]).reshape(8, 1), ("data", "model"))
    sh_rev = NamedSharding(rev, P(None, "data"))
    with pytest.raises(ValueError, match="not process-major|not the"):
        validate_process_slice(sh_rev, (2, 16), 0, 2, proc_of=proc_of)

    # model-axis replication doesn't confuse the row-domain math
    mesh22 = Mesh(np.array(devs).reshape(4, 2), ("data", "model"))
    sh22 = NamedSharding(mesh22, P(None, "data"))
    for p in (0, 1):
        validate_process_slice(sh22, (2, 16), p, 2, proc_of=proc_of)


def test_prefetch_loader_propagates_decode_errors(flat_dataset):
    """Same failure class as the ordered loader: a worker whose decode
    raises must surface the error at __next__, not die silently and
    eventually starve the consumer."""
    from biggan_tpu.data.pipeline import PrefetchLoader

    src = _index_source(flat_dataset, sampling="shuffle")
    src._load = lambda path: (_ for _ in ()).throw(OSError("truncated file"))
    ld = PrefetchLoader(src, (1, 4), workers=2)
    try:
        with pytest.raises(RuntimeError, match="worker failed"):
            next(ld)
    finally:
        ld.close()


def test_synthetic_batch_at_deterministic():
    from biggan_tpu.data.synthetic import SyntheticSource

    a = SyntheticSource(8, num_classes=5, seed=2)
    b = SyntheticSource(8, num_classes=5, seed=2)
    pos = np.array([0, 1, 7, 123456789])
    ba, bb = a.batch_at(pos), b.batch_at(pos)
    np.testing.assert_array_equal(ba["image"], bb["image"])
    np.testing.assert_array_equal(ba["label"], bb["label"])
    assert ba["image"].shape == (4, 8, 8, 3)
    assert ba["label"].min() >= 0 and ba["label"].max() < 5
    # different positions → different images; different seed → different too
    assert not np.array_equal(ba["image"][0], ba["image"][1])
    c = SyntheticSource(8, num_classes=5, seed=3).batch_at(pos)
    assert not np.array_equal(ba["image"], c["image"])


def test_native_loader_epoch_exact(tmp_path):
    from biggan_tpu.data import native_loader

    if not native_loader.available():
        pytest.skip("native loader toolchain unavailable")

    rng = np.random.RandomState(1)
    files = []
    for i in range(6):
        arr = rng.randint(0, 256, (8, 8, 3), np.uint8)
        p = tmp_path / f"img_{i}.png"
        Image.fromarray(arr).save(p)
        files.append(str(p))
    # unique label per file makes the traversal observable
    labels = np.arange(len(files), dtype=np.int32)

    # n_threads=1: multiple workers interleave their pulls from the shared
    # cursor, so per-batch permutation structure needs a single worker
    # (global exactness holds regardless; order within a batch does not)
    nsrc = native_loader.NativeImageFolderSource(
        files, labels, img_size=4, batch=len(files), seed=3,
        sampling="shuffle", n_threads=1,
    )
    try:
        first = np.sort(nsrc.batch(len(files))["label"])
        second_raw = nsrc.batch(len(files))["label"]
    finally:
        nsrc.close()
    np.testing.assert_array_equal(first, labels)
    np.testing.assert_array_equal(np.sort(second_raw), labels)


def test_native_loader_start_count_resume(tmp_path):
    from biggan_tpu.data import native_loader

    if not native_loader.available():
        pytest.skip("native loader toolchain unavailable")

    rng = np.random.RandomState(2)
    files = []
    for i in range(8):
        arr = rng.randint(0, 256, (8, 8, 3), np.uint8)
        p = tmp_path / f"img_{i}.png"
        Image.fromarray(arr).save(p)
        files.append(str(p))
    labels = np.arange(len(files), dtype=np.int32)

    def run(start, n_batches, batch=4):
        src = native_loader.NativeImageFolderSource(
            files, labels, img_size=4, batch=batch, seed=7,
            sampling="shuffle", start_count=start, n_threads=1,
        )
        try:
            return np.concatenate([src.batch(batch)["label"] for _ in range(n_batches)])
        finally:
            src.close()

    full = run(0, 4)
    resumed = run(8, 2)
    np.testing.assert_array_equal(resumed, full[8:])


def test_python_and_native_share_the_same_traversal(tmp_path):
    """Resume exactness is backend-independent: the Python fallback and the
    C++ loader derive epoch permutations from the same splitmix64
    Fisher–Yates, so the same (seed, start_count) continues the same
    traversal whichever backend loads on the resuming host."""
    from biggan_tpu.data import native_loader
    from biggan_tpu.data.pipeline import shared_epoch_perm

    if not native_loader.available():
        pytest.skip("native loader toolchain unavailable")

    rng = np.random.RandomState(4)
    files = []
    for i in range(9):
        arr = rng.randint(0, 256, (8, 8, 3), np.uint8)
        p = tmp_path / f"img_{i}.png"
        Image.fromarray(arr).save(p)
        files.append(str(p))
    labels = np.arange(len(files), dtype=np.int32)

    nsrc = native_loader.NativeImageFolderSource(
        files, labels, img_size=4, batch=3, seed=11,
        sampling="shuffle", n_threads=1,
    )
    try:
        native_order = np.concatenate(
            [nsrc.batch(3)["label"] for _ in range(6)]  # two epochs
        )
    finally:
        nsrc.close()

    expected = np.concatenate(
        [shared_epoch_perm(11, epoch, len(files)) for epoch in range(2)]
    )
    np.testing.assert_array_equal(native_order, expected)

    # and the Python source follows the identical order
    src = _index_source(tmp_path, sampling="shuffle", seed=11)
    py_order = np.concatenate([src.batch(3)["image"][:, 0, 0, 0] for _ in range(6)])
    np.testing.assert_array_equal(py_order, expected)
