"""Activations — the reference ops contract (ref ``ops.py:~345-355``).

The models only use ``relu``/``tanh`` (SURVEY §3.3), but ``lrelu`` is part
of the reference's public ops vocabulary, so it is provided for API parity
(and for fork configs that might select it).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def relu(x: jax.Array) -> jax.Array:
    return jax.nn.relu(x)


def lrelu(x: jax.Array, alpha: float = 0.2) -> jax.Array:
    """Leaky ReLU, slope ``alpha`` on the negative side (ref ``ops.py:~348``)."""
    return jax.nn.leaky_relu(x, negative_slope=alpha)


def tanh(x: jax.Array) -> jax.Array:
    return jnp.tanh(x)
