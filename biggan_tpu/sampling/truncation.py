"""z sampling and the truncation trick.

The reference bakes 2σ truncation into both train and test z via
``tf.truncated_normal`` (BigGAN_128.py:~195; SURVEY §2.3). Here:

- ``sample_z(..., dist="truncated", truncation=2.0)`` reproduces that;
- ``sample_z(..., dist="normal")`` is the paper's N(0, I) training draw;
- inference applies the truncation trick with configurable threshold and
  a ψ scale (``z ← ψ·z_trunc``), the paper's quality/variety dial.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sample_z(
    rng: jax.Array,
    shape: tuple,
    dist: str = "truncated",
    truncation: float = 2.0,
    psi: float = 1.0,
) -> jax.Array:
    """Draw z. ``dist``: "normal" | "truncated". ψ scales the final draw."""
    if dist == "normal":
        z = jax.random.normal(rng, shape, jnp.float32)
    elif dist == "truncated":
        # tf.truncated_normal: resample beyond 2σ ≡ jax truncated_normal bounds
        z = jax.random.truncated_normal(rng, -truncation, truncation, shape, jnp.float32)
    else:
        raise ValueError(f"unknown z dist {dist!r}; expected 'normal' or 'truncated'")
    if psi != 1.0:
        z = psi * z
    return z
