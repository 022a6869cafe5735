"""Observability: structured metrics + param-count table (SURVEY.md §5).

The reference logs ``d_loss``/``g_loss`` scalars to TensorBoard via
``tf.summary`` + ``FileWriter(logs/<model_dir>)`` and prints one stdout
line per iteration (ref BigGAN_128.py:~255-258, ~285); ``main.py`` dumps a
param-count table at startup via tf.slim's ``show_all_variables``
(utils.py:~85-90). Equivalents here:

- :class:`MetricsLogger` — JSONL metrics file (one line per log event,
  machine-readable) + optional TensorBoard event file when TF is present,
  + the same per-iteration stdout line.
- :func:`show_all_variables` — param table per top-level module scope.
- Throughput (images/sec) is logged as a first-class metric — it is the
  BASELINE headline number.
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional

import jax
import numpy as np


def show_all_variables(name: str, params) -> int:
    """Print a per-scope param-count table; returns the total count."""
    import flax

    flat = flax.traverse_util.flatten_dict(params)
    by_scope: dict[str, int] = {}
    total = 0
    for path, leaf in flat.items():
        scope = path[0] if path else "?"
        by_scope[scope] = by_scope.get(scope, 0) + int(np.prod(leaf.shape))
        total += int(np.prod(leaf.shape))
    print(f"--- {name} variables ---")
    for scope in sorted(by_scope):
        print(f"  {scope:<24s} {by_scope[scope]:>14,d}")
    print(f"  {'TOTAL':<24s} {total:>14,d}")
    return total


class MetricsLogger:
    """JSONL + optional TensorBoard scalars + stdout line per iteration."""

    def __init__(self, log_dir: str, use_tensorboard: bool = True):
        os.makedirs(log_dir, exist_ok=True)
        self.log_dir = log_dir
        self._jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a", buffering=1)
        self._tb = None
        if use_tensorboard:
            try:
                import tensorflow as tf

                self._tb = tf.summary.create_file_writer(log_dir)
            except Exception:
                self._tb = None
        self._t0 = time.time()

    def log(self, step: int, metrics: dict, prefix: str = "") -> None:
        scalars = {
            k: float(v) for k, v in metrics.items()
            if np.ndim(v) == 0 or (hasattr(v, "size") and v.size == 1)
        }
        record = {"step": int(step), "time": time.time() - self._t0, **scalars}
        self._jsonl.write(json.dumps(record) + "\n")
        if self._tb is not None:
            import tensorflow as tf

            with self._tb.as_default():
                for k, v in scalars.items():
                    tf.summary.scalar(prefix + k, v, step=step)

    def log_histogram(self, step: int, name: str, values) -> None:
        """TensorBoard histogram (SURVEY §5: σ(W) histograms). The JSONL
        stream gets summary stats so the data survives without TB."""
        values = np.asarray(values, np.float32).ravel()
        if values.size == 0:
            return
        record = {
            "step": int(step),
            "time": time.time() - self._t0,
            f"{name}/min": float(values.min()),
            f"{name}/max": float(values.max()),
            f"{name}/mean": float(values.mean()),
        }
        self._jsonl.write(json.dumps(record) + "\n")
        if self._tb is not None:
            import tensorflow as tf

            with self._tb.as_default():
                tf.summary.histogram(name, values, step=step)

    def print_iter(
        self,
        epoch: int,
        idx: int,
        iters_per_epoch: int,
        step_time: float,
        metrics: dict,
        images_per_sec: Optional[float] = None,
    ) -> None:
        # the reference's per-iteration line (BigGAN_128.py:~285), plus throughput
        line = (
            f"Epoch: [{epoch:2d}] [{idx:5d}/{iters_per_epoch:5d}] "
            f"time: {step_time:.3f}s d_loss: {float(metrics['d_loss']):.5f} "
            f"g_loss: {float(metrics['g_loss']):.5f}"
        )
        if images_per_sec is not None:
            line += f" img/s: {images_per_sec:,.0f}"
        print(line, flush=True)

    def close(self):
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()


def start_profiler_server(port: int = 9999) -> None:
    """jax.profiler trace server for TensorBoard profiling (SURVEY §5)."""
    jax.profiler.start_server(port)
