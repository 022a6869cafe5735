"""Residual blocks (ref ``ops.py:~150-247``).

Three block shapes, all NHWC:

- :class:`ResBlockUp` — the G block. cBN→ReLU→(upsample)→conv ×2 with a
  conv skip (ref ``resblock_up_condition``, ops.py:~198-222). The
  conditioning vector feeds both cBNs. Two upsample modes:

  * ``"deconv"`` — transposed conv s2, reference-faithful (the reference
    uses deconv for G upsampling, ops.py:~173-195 — a deviation from the
    BigGAN paper).
  * ``"nn_conv"`` — nearest-neighbor ×2 resize + 3×3 conv, the paper's
    scheme; cheaper on TPU (dense conv fuses better than strided transpose)
    and free of checkerboard artifacts. Selected per-config.

- :class:`ResBlockDown` — the D block: BN→ReLU→conv(s2) / conv(s1) with a
  conv(s2) skip (ref ``resblock_down``, ops.py:~225-247; the reference
  keeps BN in D — kept here behind ``use_norm`` for parity, default ON to
  match, paper-style SN-only D available via config).
- :class:`ResBlock` — no-resize block, last D stage (ref ``resblock``).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from biggan_tpu.ops.layers import SNConv2D, SNConvTranspose2D
from biggan_tpu.ops.norm import BatchNorm, ConditionalBatchNorm
from biggan_tpu.ops.pooling import avg_pool, up_sample


class ResBlockUp(nn.Module):
    """Conditional up-sampling G block.

    ``use_bias`` defaults to False: the reference model passes
    ``use_bias=False`` into every G res-block (ref ``BigGAN_128.generator``,
    :~65-110) — cBN's β provides the shift. In ``"deconv"`` mode the second
    conv is a stride-1 **transposed** conv like the reference's ``res2``
    (deconv k3 s1, ref ops.py:~198-222), so imported kernels keep their
    deconv layout/SN semantics.
    """

    features: int
    use_sn: bool = True
    use_bias: bool = False
    materialize_weights: bool = False
    up_mode: str = "deconv"  # "deconv" (ref-faithful) | "nn_conv" (paper)
    norm_opt_bwd: bool = False  # pinned-residual BN backward (ops/norm.py)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        cond: jax.Array,
        train: bool = True,
        axis_name: Optional[str] = None,
    ) -> jax.Array:
        kw = dict(use_sn=self.use_sn, use_bias=self.use_bias,
                  materialize_weights=self.materialize_weights, dtype=self.dtype)
        norm = lambda name: ConditionalBatchNorm(  # noqa: E731
            dtype=self.dtype, opt_bwd=self.norm_opt_bwd, name=name
        )

        def up_conv(name, h):
            if self.up_mode == "deconv":
                return SNConvTranspose2D(self.features, 3, 2, name=name, **kw)(h, update_sn=train)
            return SNConv2D(self.features, 3, 1, name=name, **kw)(up_sample(h), update_sn=train)

        h = norm("cbn1")(x, cond, use_running_average=not train, axis_name=axis_name)
        h = nn.relu(h)
        h = up_conv("conv1", h)
        h = norm("cbn2")(h, cond, use_running_average=not train, axis_name=axis_name)
        h = nn.relu(h)
        if self.up_mode == "deconv":
            h = SNConvTranspose2D(self.features, 3, 1, name="conv2", **kw)(h, update_sn=train)
        else:
            h = SNConv2D(self.features, 3, 1, name="conv2", **kw)(h, update_sn=train)

        skip = up_conv("skip", x)
        return h + skip


class ResBlockDown(nn.Module):
    """Down-sampling D block (ref passes ``use_bias=False`` into D blocks)."""

    features: int
    use_sn: bool = True
    use_bias: bool = False
    materialize_weights: bool = False
    use_norm: bool = True  # ref keeps BN in D (ops.py:~225-247); paper omits it
    down_mode: str = "conv"  # "conv" (ref: strided conv) | "pool" (paper: conv + avgpool)
    norm_opt_bwd: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        train: bool = True,
        axis_name: Optional[str] = None,
    ) -> jax.Array:
        kw = dict(use_sn=self.use_sn, use_bias=self.use_bias,
                  materialize_weights=self.materialize_weights, dtype=self.dtype)

        def maybe_norm(name, h):
            if not self.use_norm:
                return h
            return BatchNorm(dtype=self.dtype, opt_bwd=self.norm_opt_bwd, name=name)(
                h, use_running_average=not train, axis_name=axis_name
            )

        def down_conv(name, h):
            if self.down_mode == "conv":
                return SNConv2D(self.features, 3, 2, name=name, **kw)(h, update_sn=train)
            h = SNConv2D(self.features, 3, 1, name=name, **kw)(h, update_sn=train)
            return avg_pool(h)

        h = maybe_norm("bn1", x)
        h = nn.relu(h)
        h = down_conv("conv1", h)
        h = maybe_norm("bn2", h)
        h = nn.relu(h)
        h = SNConv2D(self.features, 3, 1, name="conv2", **kw)(h, update_sn=train)

        skip = down_conv("skip", x)
        return h + skip


class ResBlock(nn.Module):
    """No-resize block — the last D stage (ref ``resblock``, ops.py:~150-170;
    the model calls it with ``use_bias=False`` like the other D blocks)."""

    features: int
    use_sn: bool = True
    use_bias: bool = False
    materialize_weights: bool = False
    use_norm: bool = True
    norm_opt_bwd: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        train: bool = True,
        axis_name: Optional[str] = None,
    ) -> jax.Array:
        kw = dict(use_sn=self.use_sn, use_bias=self.use_bias,
                  materialize_weights=self.materialize_weights, dtype=self.dtype)

        def maybe_norm(name, h):
            if not self.use_norm:
                return h
            return BatchNorm(dtype=self.dtype, opt_bwd=self.norm_opt_bwd, name=name)(
                h, use_running_average=not train, axis_name=axis_name
            )

        h = maybe_norm("bn1", x)
        h = nn.relu(h)
        h = SNConv2D(self.features, 3, 1, name="conv1", **kw)(h, update_sn=train)
        h = maybe_norm("bn2", h)
        h = nn.relu(h)
        h = SNConv2D(self.features, 3, 1, name="conv2", **kw)(h, update_sn=train)
        return h + x
