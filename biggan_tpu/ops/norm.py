"""Batch norm and conditional batch norm with cross-replica moments.

Reference semantics (ref ``ops.py:~358-400``):

- ``batch_norm``: decay 0.9, eps 1e-5, population stats updated every
  training forward pass.
- ``condition_batch_norm(x, z)``: per-channel population mean/var as
  non-trainable state; γ and β are *computed per example* by two dense
  layers from the conditioning vector ``z`` (the per-layer z-chunk, and —
  per the north star — the shared class embedding concatenated to it);
  training normalizes with batch moments and EMAs them into the population
  stats; eval normalizes with population stats.

TPU-native deltas:

- **Cross-replica moments.** The reference computes per-GPU moments
  (single device). Here moments are global-batch by construction: under
  ``jit`` over a ``Mesh`` with the batch sharded on the ``data`` axis,
  ``jnp.mean`` over the batch axis makes GSPMD insert the ``psum`` over ICI
  automatically. For explicit-collective callers (``shard_map``/``pmap``),
  pass ``axis_name`` and the moments are ``lax.pmean``-ed by hand. Both
  paths are equivalence-tested on a virtual 8-device CPU mesh.
- Moments are computed in float32 even under bf16 compute: variance of a
  bf16 sum over N·H·W elements loses too many bits.
- State lives in the ``batch_stats`` collection (mean/var), mutated only
  when ``use_running_average=False``.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from biggan_tpu.ops.layers import SNDense

_BN_DECAY = 0.9  # ref ops.py:~358: tf_contrib.layers.batch_norm(decay=0.9)
_BN_EPS = 1e-5


def _batch_moments(x: jax.Array, axis_name: Optional[str]):
    """Mean/var over (N, H, W) in float32, cross-replica if axis_name given."""
    x32 = x.astype(jnp.float32)
    axes = tuple(range(x.ndim - 1))  # all but channels
    mean = jnp.mean(x32, axis=axes)
    mean_sq = jnp.mean(jnp.square(x32), axis=axes)
    if axis_name is not None:
        mean = jax.lax.pmean(mean, axis_name)
        mean_sq = jax.lax.pmean(mean_sq, axis_name)
    var = jnp.maximum(mean_sq - jnp.square(mean), 0.0)
    return mean, var


class _RunningStats(nn.Module):
    """Owner of the pop_mean/pop_var EMA state shared by BN and cBN."""

    def stats(self, features: int):
        mean = self.variable("batch_stats", "mean", nn.initializers.zeros, None, (features,), jnp.float32)
        var = self.variable("batch_stats", "var", nn.initializers.ones, None, (features,), jnp.float32)
        return mean, var

    def update(self, mean_v, var_v, batch_mean, batch_var, decay):
        # ref ops.py:~368-400: pop = pop*decay + batch*(1-decay) via assign.
        if not self.is_initializing():
            mean_v.value = decay * mean_v.value + (1.0 - decay) * batch_mean
            var_v.value = decay * var_v.value + (1.0 - decay) * batch_var


class BatchNorm(_RunningStats):
    """Plain BN with learned scalar-per-channel γ/β (ref ``batch_norm``)."""

    decay: float = _BN_DECAY
    eps: float = _BN_EPS
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        use_running_average: bool = False,
        axis_name: Optional[str] = None,
    ) -> jax.Array:
        features = x.shape[-1]
        gamma = self.param("scale", nn.initializers.ones, (features,), jnp.float32)
        beta = self.param("bias", nn.initializers.zeros, (features,), jnp.float32)
        mean_v, var_v = self.stats(features)
        if use_running_average:
            mean, var = mean_v.value, var_v.value
        else:
            mean, var = _batch_moments(x, axis_name)
            self.update(mean_v, var_v, mean, var, self.decay)
        inv = jax.lax.rsqrt(var + self.eps) * gamma
        y = x.astype(jnp.float32) * inv + (beta - mean * inv)
        return y.astype(self.dtype)


class ConditionalBatchNorm(_RunningStats):
    """cBN: γ/β predicted from the conditioning vector (ref ``condition_batch_norm``).

    ``cond`` is ``concat(z_chunk, class_embedding)`` per the north star; the
    two projections are plain dense layers without SN (ref ops.py:~368-400
    uses un-normalized FCs for β/γ), **with biases**, exactly mirroring the
    reference's ``γ = FC(z)`` / ``β = FC(z)`` so imported TF checkpoints
    map kernel→kernel / bias→bias with no re-parameterization.

    Init differs from the reference on purpose (our init is our choice;
    import overwrites it): zero kernels with a ones-init γ bias give
    γ ≈ 1, β ≈ 0 at step 0 — the standard stable BigGAN start — whereas a
    fresh reference draw starts γ near 0 (trunc-normal(0.02) kernel, zero
    bias), which squashes every block's output at init.
    """

    decay: float = _BN_DECAY
    eps: float = _BN_EPS
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        cond: jax.Array,
        use_running_average: bool = False,
        axis_name: Optional[str] = None,
    ) -> jax.Array:
        features = x.shape[-1]
        cond32 = cond.astype(jnp.float32)
        gamma = SNDense(
            features,
            use_bias=True,
            dtype=jnp.float32,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.ones,
            name="gamma",
        )(cond32)
        beta = SNDense(
            features,
            use_bias=True,
            dtype=jnp.float32,
            kernel_init=nn.initializers.zeros,
            name="beta",
        )(cond32)
        mean_v, var_v = self.stats(features)
        if use_running_average:
            mean, var = mean_v.value, var_v.value
        else:
            mean, var = _batch_moments(x, axis_name)
            self.update(mean_v, var_v, mean, var, self.decay)
        inv = jax.lax.rsqrt(var + self.eps)  # [C]
        xhat = (x.astype(jnp.float32) - mean) * inv  # [N,H,W,C]
        # per-example γ/β: [N,C] → broadcast over H,W
        gamma = gamma[:, None, None, :]
        beta = beta[:, None, None, :]
        return (xhat * gamma + beta).astype(self.dtype)
