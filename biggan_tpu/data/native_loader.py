"""ctypes bindings for the native C++ data loader.

The native loader (``data/native/loader.cc``) is the TPU framework's
counterpart of the reference's tf.data C++ input runtime
(ref ``BigGAN_128.py:~188-194``): a worker pool decodes JPEG/PNG and
bilinear-resizes on host threads, handing ready uint8 batches to Python
through a bounded queue with zero per-image Python overhead.

The shared library is compiled on first use (g++, cached next to the
source, rebuilt when the source is newer). If the toolchain or headers
are missing, callers fall back to the PIL pipeline
(:class:`biggan_tpu.data.pipeline.ImageFolderSource`).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "native", "loader.cc")
_LIB = os.path.join(os.path.dirname(__file__), "native", "libbtloader.so")
_build_lock = threading.Lock()


def _build() -> str:
    with _build_lock:
        if os.path.exists(_LIB) and os.path.getmtime(_LIB) >= os.path.getmtime(_SRC):
            return _LIB
        cmd = [
            "g++", "-O3", "-march=native", "-shared", "-fPIC", _SRC,
            "-o", _LIB, "-ljpeg", "-lpng", "-lpthread",
        ]
        subprocess.run(cmd, check=True, capture_output=True)
        return _LIB


_lib_handle = None


def _lib() -> ctypes.CDLL:
    global _lib_handle
    if _lib_handle is None:
        lib = ctypes.CDLL(_build())
        lib.bt_loader_create.restype = ctypes.c_void_p
        lib.bt_loader_create.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_uint64,
            ctypes.c_int, ctypes.c_uint64,  # mode (0=iid, 1=shuffle), start_count
        ]
        lib.bt_loader_next.restype = ctypes.c_int
        lib.bt_loader_next.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.bt_loader_destroy.argtypes = [ctypes.c_void_p]
        lib.bt_decode_indices.restype = ctypes.c_int
        lib.bt_decode_indices.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ]
        _lib_handle = lib
    return _lib_handle


def available() -> bool:
    try:
        _lib()
        return True
    except (subprocess.CalledProcessError, OSError):
        return False


class NativeDecodePool:
    """Stateless parallel decode+resize over an explicit index list.

    The multi-host/ordered data path (``ShardedOrderedLoader``) computes
    WHICH files belong to global batch *k* in Python — a pure function of
    ``(seed, k)`` — and hands the index list here, so traversal
    determinism lives in one place while decode runs at native pool
    speed. Unlike :class:`NativeImageFolderSource` there is no shared
    cursor and no queue: ordering is the caller's, by construction.
    """

    def __init__(self, files, labels, img_size: int, n_threads: int = 8):
        if not files:
            raise FileNotFoundError("native decode pool: empty file list")
        self.img_size = img_size
        self.n_threads = n_threads
        self._files = [f.encode() for f in files]
        self._arr = (ctypes.c_char_p * len(self._files))(*self._files)
        if labels is not None:
            self._labels = np.ascontiguousarray(labels, np.int32)
            self._lab_ptr = self._labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
        else:
            self._labels = None
            self._lab_ptr = None
        _lib()  # build/load eagerly so failures surface at construction

    def decode(self, indices: np.ndarray) -> dict:
        indices = np.ascontiguousarray(indices, np.int64)
        n = len(indices)
        images = np.empty((n, self.img_size, self.img_size, 3), np.uint8)
        out_labels = np.empty((n,), np.int32) if self._labels is not None else None
        failures = _lib().bt_decode_indices(
            self._arr, len(self._files), self.img_size,
            indices.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), n,
            self.n_threads,
            images.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            self._lab_ptr,
            out_labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
            if out_labels is not None else None,
        )
        if failures:
            # zeroed slots, not silence (a corrupt file in a deterministic
            # traversal must not silently skew the batch distribution)
            print(f" [!] native decode pool: {failures}/{n} files failed to "
                  "decode (slots zeroed)")
        out = {"image": images}
        if out_labels is not None:
            out["label"] = out_labels
        return out


class NativeImageFolderSource:
    """Drop-in replacement for ``ImageFolderSource`` backed by the C++
    worker pool. Same ``batch(n)`` contract; batches are pre-assembled at
    a fixed size, so ``n`` must be constant per instance (it is — the
    train loop always asks for ``n_critic·batch_size``)."""

    def __init__(self, files, labels, img_size: int, batch: int,
                 n_threads: int = 8, queue_cap: int = 4, seed: int = 0,
                 sampling: str = "shuffle", start_count: int = 0):
        if not files:
            raise FileNotFoundError("native loader: empty file list")
        if sampling not in ("shuffle", "iid"):
            raise ValueError(f"sampling must be 'shuffle' or 'iid', got {sampling!r}")
        self.img_size, self.batch_size = img_size, batch
        self.num_classes = int(labels.max()) + 1 if labels is not None else 0
        self._files = [f.encode() for f in files]
        arr = (ctypes.c_char_p * len(self._files))(*self._files)
        if labels is not None:
            labels = np.ascontiguousarray(labels, np.int32)
            self._labels_keepalive = labels
            lab_ptr = labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
        else:
            lab_ptr = None
        self._has_labels = labels is not None
        self._handle = _lib().bt_loader_create(
            arr, len(self._files), lab_ptr, img_size, batch,
            n_threads, queue_cap, seed,
            1 if sampling == "shuffle" else 0, start_count,
        )
        if not self._handle:
            raise RuntimeError("bt_loader_create failed")

    def batch(self, n: int) -> dict:
        if n != self.batch_size:
            raise ValueError(
                f"native loader built for batch {self.batch_size}, got {n}"
            )
        images = np.empty((n, self.img_size, self.img_size, 3), np.uint8)
        labels = np.empty((n,), np.int32)
        rc = _lib().bt_loader_next(
            self._handle,
            images.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
        if rc != 0:
            raise RuntimeError("native loader stopped")
        out = {"image": images}
        if self._has_labels:
            out["label"] = labels
        return out

    def close(self):
        if getattr(self, "_handle", None):
            _lib().bt_loader_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
