"""Pooling / resize ops (ref ``ops.py:~315-342``)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def max_pool(x: jax.Array, window: int = 2, stride: int = 2) -> jax.Array:
    """2×2/s2 max pool, NHWC (ref ``max_pooling``)."""
    return jax.lax.reduce_window(
        x,
        -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min,
        jax.lax.max,
        window_dimensions=(1, window, window, 1),
        window_strides=(1, stride, stride, 1),
        padding="VALID",
    )


def avg_pool(x: jax.Array, window: int = 2, stride: int = 2) -> jax.Array:
    """2×2/s2 average pool, NHWC (ref ``avg_pooling``)."""
    summed = jax.lax.reduce_window(
        x.astype(jnp.float32),
        0.0,
        jax.lax.add,
        window_dimensions=(1, window, window, 1),
        window_strides=(1, stride, stride, 1),
        padding="VALID",
    )
    return (summed / (window * window)).astype(x.dtype)


def global_avg_pool(x: jax.Array) -> jax.Array:
    return jnp.mean(x, axis=(1, 2))


def global_sum_pool(x: jax.Array) -> jax.Array:
    """Sum over H,W — used before the D logit (ref ``global_sum_pooling``,
    paper-faithful; sum not mean)."""
    return jnp.sum(x.astype(jnp.float32), axis=(1, 2)).astype(x.dtype)


def flatten(x: jax.Array) -> jax.Array:
    """[B, ...] → [B, prod(...)] (ref ``flatten``, ops.py:~138)."""
    return x.reshape(x.shape[0], -1)


def hw_flatten(x: jax.Array) -> jax.Array:
    """[B, H, W, C] → [B, H·W, C] — the attention token view
    (ref ``hw_flatten``, ops.py:~141-144)."""
    b, h, w, c = x.shape
    return x.reshape(b, h * w, c)


def up_sample(x: jax.Array, scale: int = 2) -> jax.Array:
    """Nearest-neighbor ×scale upsample (ref ``up_sample``, ops.py:~338).

    Implemented as reshape+broadcast (no gather) so XLA lowers it to cheap
    layout ops that fuse into the following conv.
    """
    n, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (n, h, scale, w, scale, c))
    return x.reshape(n, h * scale, w * scale, c)
