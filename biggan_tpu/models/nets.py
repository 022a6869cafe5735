"""Generator and Discriminator — single parameterized pair covering 32..512 px.

Replaces the reference's three copy-pasted model files (SURVEY.md §1). The
forward traces match ref ``BigGAN_128.generator``/``discriminator``
(BigGAN_128.py:~65-150); the per-resolution stack comes from
:mod:`biggan_tpu.models.arch`.

Conditioning (north-star capability; ref upstream is label-free):

- ``num_classes > 0`` — a **shared class embedding** (one table, used by
  every layer) is concatenated with each per-layer z-chunk to form the cBN
  conditioning vector, exactly the BigGAN paper's scheme. The discriminator
  becomes a projection discriminator: ``logit += ⟨embed_d(y), pooled⟩``.
- ``num_classes == 0`` — unconditional; cBN conditions on the z-chunk
  alone (the reference's actual behavior).

z-splitting: z is split into ``num_up_blocks + 1`` contiguous chunks, as
evenly as possible (``numpy.array_split`` semantics — first chunks get the
remainder), chunk 0 feeding the seed FC (ref ``BigGAN_128.py:~68-78``).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from biggan_tpu.models.arch import get_arch
from biggan_tpu.ops.attn import SelfAttention
from biggan_tpu.ops.blocks import ResBlock, ResBlockDown, ResBlockUp
from biggan_tpu.ops.layers import SNConv2D, SNDense
from biggan_tpu.ops.norm import BatchNorm
from biggan_tpu.ops.pooling import global_sum_pool


def split_z(z: jax.Array, num_chunks: int) -> list[jax.Array]:
    """Split z[B, z_dim] into num_chunks contiguous chunks, evenly as possible."""
    z_dim = z.shape[-1]
    base, rem = divmod(z_dim, num_chunks)
    sizes = [base + (1 if i < rem else 0) for i in range(num_chunks)]
    chunks, start = [], 0
    for s in sizes:
        chunks.append(z[..., start : start + s])
        start += s
    return chunks


class Generator(nn.Module):
    """BigGAN generator (ref ``BigGAN_128.generator``, :~65-110)."""

    img_size: int = 128
    ch: int = 96
    num_classes: int = 0
    embed_dim: int = 128  # shared class-embedding width (paper)
    use_sn: bool = True
    materialize_weights: bool = False
    up_mode: str = "deconv"  # "deconv" (ref) | "nn_conv" (paper)
    attn_impl: str = "xla"  # "xla" | "pallas"
    remat: bool = False  # jax.checkpoint each block: trade FLOPs for HBM
    norm_opt_bwd: bool = False  # pinned-residual BN backward (ops/norm.py)
    out_channels: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        z: jax.Array,
        labels: Optional[jax.Array] = None,
        train: bool = True,
        axis_name: Optional[str] = None,
    ) -> jax.Array:
        arch = get_arch(self.img_size)
        chunks = split_z(z.astype(jnp.float32), arch.num_z_chunks)

        if self.num_classes > 0:
            if labels is None:
                raise ValueError("labels required when num_classes > 0")
            embed = nn.Embed(
                self.num_classes, self.embed_dim, name="shared_embed", dtype=jnp.float32
            )(labels)
            conds = [jnp.concatenate([c, embed], axis=-1) for c in chunks[1:]]
        else:
            conds = chunks[1:]

        s = arch.seed_size
        seed_ch = arch.g_seed_mult * self.ch
        h = SNDense(s * s * seed_ch, use_sn=self.use_sn,
                    materialize_weights=self.materialize_weights,
                    dtype=self.dtype, name="fc_seed")(
            chunks[0].astype(self.dtype), update_sn=train
        )
        h = h.reshape(h.shape[0], s, s, seed_ch)

        # remat: recompute each block's activations in backward — HBM for
        # FLOPs, the standard trade at 256/512px (SURVEY §7). train/axis_name
        # are static; pass positionally. NOTE flax counts `self` as arg 0 in
        # static_argnums, so (x, cond, train, axis_name) are (1, 2, 3, 4).
        BlockUp = (
            nn.remat(ResBlockUp, static_argnums=(3, 4)) if self.remat else ResBlockUp
        )
        res = s
        for i, mult in enumerate(arch.g_ch_mults):
            h = BlockUp(
                mult * self.ch,
                use_sn=self.use_sn,
                materialize_weights=self.materialize_weights,
                up_mode=self.up_mode,
                norm_opt_bwd=self.norm_opt_bwd,
                dtype=self.dtype,
                name=f"block_up_{i}",
            )(h, conds[i], train, axis_name)
            res *= 2
            if arch.attn_res is not None and res == arch.attn_res:
                h = SelfAttention(
                    use_sn=self.use_sn,
                    materialize_weights=self.materialize_weights,
                    impl=self.attn_impl, dtype=self.dtype, name="attn",
                )(h, train=train)

        h = BatchNorm(dtype=self.dtype, opt_bwd=self.norm_opt_bwd, name="bn_out")(
            h, use_running_average=not train, axis_name=axis_name
        )
        h = nn.relu(h)
        # ref G_logit conv: use_bias=False (BigGAN_128.generator, :~105)
        h = SNConv2D(
            self.out_channels, 3, 1, use_sn=self.use_sn, use_bias=False,
            materialize_weights=self.materialize_weights,
            dtype=self.dtype, name="conv_out",
        )(h, update_sn=train)
        return jnp.tanh(h.astype(jnp.float32))


class Discriminator(nn.Module):
    """BigGAN discriminator (ref ``BigGAN_128.discriminator``, :~115-150)."""

    img_size: int = 128
    ch: int = 96
    num_classes: int = 0
    use_sn: bool = True
    materialize_weights: bool = False
    use_d_norm: bool = True  # ref keeps BN in D; set False for paper-style SN-only D
    attn_impl: str = "xla"
    remat: bool = False
    norm_opt_bwd: bool = False  # True only via norm_bwd='pinned' (no GP double-diff)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        labels: Optional[jax.Array] = None,
        train: bool = True,
        axis_name: Optional[str] = None,
    ) -> jax.Array:
        arch = get_arch(self.img_size)
        BlockDown = (
            nn.remat(ResBlockDown, static_argnums=(2, 3)) if self.remat else ResBlockDown
        )
        h = x.astype(self.dtype)
        res = self.img_size
        for i, mult in enumerate(arch.d_ch_mults):
            h = BlockDown(
                mult * self.ch,
                use_sn=self.use_sn,
                materialize_weights=self.materialize_weights,
                use_norm=self.use_d_norm,
                norm_opt_bwd=self.norm_opt_bwd,
                dtype=self.dtype,
                name=f"block_down_{i}",
            )(h, train, axis_name)
            res //= 2
            if arch.attn_res is not None and res == arch.attn_res:
                h = SelfAttention(
                    use_sn=self.use_sn,
                    materialize_weights=self.materialize_weights,
                    impl=self.attn_impl, dtype=self.dtype, name="attn",
                )(h, train=train)

        h = ResBlock(
            arch.d_ch_mults[-1] * self.ch,
            use_sn=self.use_sn,
            materialize_weights=self.materialize_weights,
            use_norm=self.use_d_norm,
            norm_opt_bwd=self.norm_opt_bwd,
            dtype=self.dtype,
            name="block_final",
        )(h, train=train, axis_name=axis_name)
        h = nn.relu(h)
        pooled = global_sum_pool(h)  # [B, C] — paper-faithful sum pool
        logit = SNDense(1, use_sn=self.use_sn,
                        materialize_weights=self.materialize_weights,
                        dtype=self.dtype, name="fc_logit")(
            pooled, update_sn=train
        ).astype(jnp.float32)

        if self.num_classes > 0:
            if labels is None:
                raise ValueError("labels required when num_classes > 0")
            # projection discriminator (Miyato & Koyama; used by BigGAN paper)
            embed = nn.Embed(
                self.num_classes, pooled.shape[-1], name="proj_embed", dtype=jnp.float32
            )(labels)
            logit = logit + jnp.sum(
                embed * pooled.astype(jnp.float32), axis=-1, keepdims=True
            )
        return logit
