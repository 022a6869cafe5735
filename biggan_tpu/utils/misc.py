"""Small helpers matching the reference's utils (ref utils.py:~93-100)."""

from __future__ import annotations

import os


def check_folder(path: str) -> str:
    """mkdir -p and return the path (ref ``check_folder``)."""
    os.makedirs(path, exist_ok=True)
    return path


def str2bool(v) -> bool:
    """argparse-friendly bool parser (ref ``str2bool``)."""
    if isinstance(v, bool):
        return v
    if str(v).lower() in ("true", "t", "yes", "y", "1"):
        return True
    if str(v).lower() in ("false", "f", "no", "n", "0"):
        return False
    raise ValueError(f"boolean value expected, got {v!r}")
