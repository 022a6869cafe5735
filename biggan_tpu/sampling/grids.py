"""PNG sample-grid artifacts (ref ``utils.save_images``/``merge``,
utils.py:~45-80).

The reference writes ``samples/<model>_train_EE_IIIII.png`` during training
and ``results/<model_dir>/<model>_test_i.png`` from ``test()``
(BigGAN_128.py:~345-380). Same artifacts here. Images arrive in [-1, 1]
(tanh output) and are mapped back with the reference's
``inverse_transform``: ``(x + 1) / 2``.

PNG encoding is dependency-light: PIL if available, else a minimal pure-
Python PNG writer (zlib is stdlib) so the framework has zero hard imaging
deps on TPU hosts.
"""

from __future__ import annotations

import os
import struct
import zlib

import numpy as np


def inverse_transform(images: np.ndarray) -> np.ndarray:
    """[-1,1] float → [0,1] float (ref ``inverse_transform``)."""
    return (images + 1.0) / 2.0


def merge_grid(images: np.ndarray, grid_hw: tuple[int, int]) -> np.ndarray:
    """Tile [N,H,W,C] into a single [gh·H, gw·W, C] image (ref ``merge``)."""
    gh, gw = grid_hw
    n, h, w, c = images.shape
    if gh * gw < n:
        raise ValueError(f"grid {gh}x{gw} too small for {n} images")
    canvas = np.zeros((gh * h, gw * w, c), dtype=images.dtype)
    for idx in range(min(n, gh * gw)):
        i, j = divmod(idx, gw)
        canvas[i * h : (i + 1) * h, j * w : (j + 1) * w] = images[idx]
    return canvas


def _write_png(path: str, rgb: np.ndarray) -> None:
    """Minimal RGB8 PNG writer (stdlib only)."""
    h, w, _ = rgb.shape
    raw = b"".join(b"\x00" + rgb[i].tobytes() for i in range(h))

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit RGB
    payload = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )
    with open(path, "wb") as f:
        f.write(payload)


def save_image_grid(images, path: str, grid_hw: tuple[int, int] | None = None) -> str:
    """Save [N,H,W,C] images in [-1,1] as one PNG grid; returns the path."""
    images = np.asarray(images, dtype=np.float32)
    n = images.shape[0]
    if grid_hw is None:
        gw = int(np.ceil(np.sqrt(n)))
        gh = int(np.ceil(n / gw))
        grid_hw = (gh, gw)
    grid = merge_grid(inverse_transform(images), grid_hw)
    rgb = np.clip(np.rint(grid * 255.0), 0, 255).astype(np.uint8)
    if rgb.shape[-1] == 1:
        rgb = np.repeat(rgb, 3, axis=-1)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    try:
        from PIL import Image

        Image.fromarray(rgb).save(path)
    except ImportError:
        _write_png(path, rgb)
    return path
