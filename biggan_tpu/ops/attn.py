"""SAGAN-style self-attention over the H·W token axis.

Reference (ref ``ops.py:~250-310``) has two variants; the models use the
memory-lean ``self_attention_2``:

- query  ``g`` = 1×1 conv → C/8, over all N = H·W tokens
- key    ``f`` = 1×1 conv → C/8, then 2×2 max-pool → N/4 tokens
- value  ``h`` = 1×1 conv → C/2, then 2×2 max-pool → N/4 tokens
- ``attn = softmax(g·fᵀ)`` (no 1/√d scaling in SAGAN), ``o = attn·h``,
  1×1 conv back to C, output ``γ·o + x`` with scalar γ initialized to 0.

TPU-native design: the N×(N/4) score matrix at the reference's largest
placement (64×64 → 4096×1024) fits VMEM-tiled comfortably, but the naive
XLA path materializes it in HBM. The Pallas path
(:mod:`biggan_tpu.kernels.attention_pallas`) computes flash-style blockwise
softmax(QKᵀ)V with online renormalization, never materializing scores —
HBM stays flat if a config moves attention to 128×128 (N = 16384). Both
paths are parity-tested; ``impl`` selects ("xla" | "pallas").
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from biggan_tpu.ops.layers import SNConv2D, _SNMixin, kernel_init
from biggan_tpu.ops.pooling import max_pool


def attention_xla(q: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
    """softmax(q·kᵀ)·v, unscaled (SAGAN). q:[B,N,d] k:[B,M,d] v:[B,M,dv]."""
    scores = jnp.einsum("bnd,bmd->bnm", q, k, preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bnm,bmv->bnv", probs.astype(v.dtype), v, preferred_element_type=jnp.float32).astype(v.dtype)


class _SNProjWeights(nn.Module):
    """Owns one 1×1-conv projection's params (kernel/bias/u) with the SAME
    tree layout as :class:`SNConv2D` — checkpoint paths are unchanged —
    but returns the (spectrally normalized) weight matrix instead of
    applying it, so the parent can run q/k/v as ONE concatenated matmul.

    Why: the three projections are output-thin (C/8 = 24 lanes at the
    flagship) — separate matmuls run the MXU at ≤19% lane utilization and
    read the [B,N,C] activation three times. Concatenated, the weight is
    [C, C/8+C/8+C/2] (144 lanes at C=192) over one activation read.
    Measured on device trace: a net REGRESSION at the flagship config —
    see ``SelfAttention.fused_qkv``. Kept for shapes where it may win.
    """

    features: int
    use_sn: bool = True
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, in_features: int, update_sn: bool):
        w = self.param(
            "kernel", kernel_init, (1, 1, in_features, self.features), jnp.float32
        )
        w = _SNMixin._maybe_sn(self, w, self.use_sn, update_sn)
        b = (
            self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            if self.use_bias
            else None
        )
        return w.reshape(in_features, self.features), b


class SelfAttention(nn.Module):
    """``self_attention_2``-equivalent module (ref ops.py:~278-310).

    ``pooled_kv=False`` gives the full ``self_attention`` variant
    (C/8 keys, full-C values, no pooling; ref ops.py:~250-275).
    """

    use_sn: bool = True
    pooled_kv: bool = True
    # ref ``conv`` defaults use_bias=True and the attention convs don't
    # override it (ops.py:~278-310) — keep biases for import parity.
    use_bias: bool = True
    materialize_weights: bool = False
    # "auto": Pallas flash kernel on TPU (equal to XLA in clean windows,
    # ~25% faster under per-execute-overhead regimes — BENCH_NOTES.md),
    # XLA elsewhere. Or force "xla" / "pallas".
    impl: str = "auto"
    # One concatenated q/k/v projection matmul instead of three thin 1×1
    # convs (same math, same param tree — see _SNProjWeights). Measured
    # on the device trace: 696.6 vs 599.1 ms/step at the flagship config
    # — a 16% REGRESSION. The fat matmul wins on paper, but splitting
    # qkv afterwards breaks XLA's conv→maxpool/layout fusions (standalone
    # reduce-window +64 ms, reshapes +32 ms). Default OFF; kept as a
    # parity-tested option because the trade may flip at other shapes.
    fused_qkv: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> jax.Array:
        n_batch, h, w, c = x.shape
        n_tok = h * w
        kw = dict(use_sn=self.use_sn, use_bias=self.use_bias,
                  materialize_weights=self.materialize_weights, dtype=self.dtype)

        # floor of 1: c<8 never occurs in a real BigGAN config but a
        # zero-width conv fails with an opaque ZeroDivisionError inside SN.
        qk_ch = max(c // 8, 1)
        v_ch = max(c // 2, 1) if self.pooled_kv else c
        if self.fused_qkv:
            pkw = dict(use_sn=self.use_sn, use_bias=self.use_bias, dtype=self.dtype)
            # reference scope names preserved: g=query, f=key, h=value
            q_w, q_b = _SNProjWeights(qk_ch, name="g_conv", **pkw)(c, train)
            k_w, k_b = _SNProjWeights(qk_ch, name="f_conv", **pkw)(c, train)
            v_w, v_b = _SNProjWeights(v_ch, name="h_conv", **pkw)(c, train)
            w_qkv = jnp.concatenate([q_w, k_w, v_w], axis=-1).astype(self.dtype)
            qkv = jnp.dot(
                x.reshape(n_batch * n_tok, c).astype(self.dtype),
                w_qkv,
                preferred_element_type=self.dtype,
            )
            if self.use_bias:
                qkv = qkv + jnp.concatenate([q_b, k_b, v_b]).astype(self.dtype)
            qkv = qkv.reshape(n_batch, h, w, -1)
            q = qkv[..., :qk_ch]
            k = qkv[..., qk_ch : 2 * qk_ch]
            v = qkv[..., 2 * qk_ch :]
        else:
            q = SNConv2D(qk_ch, 1, 1, name="g_conv", **kw)(x, update_sn=train)
            k = SNConv2D(qk_ch, 1, 1, name="f_conv", **kw)(x, update_sn=train)
            v = SNConv2D(v_ch, 1, 1, name="h_conv", **kw)(x, update_sn=train)
        if self.pooled_kv:
            k = max_pool(k)
            v = max_pool(v)

        q = q.reshape(n_batch, n_tok, -1)
        k = k.reshape(n_batch, -1, k.shape[-1])
        v = v.reshape(n_batch, -1, v_ch)

        impl = self.impl
        if impl == "auto":
            impl = "pallas" if jax.default_backend() == "tpu" else "xla"
        if impl == "pallas":
            from biggan_tpu.kernels.attention_pallas import flash_attention

            o = flash_attention(q, k, v)
        else:
            o = attention_xla(q, k, v)
        o = o.reshape(n_batch, h, w, v_ch)

        if self.pooled_kv:
            o = SNConv2D(c, 1, 1, name="attn_conv", **kw)(o, update_sn=train)
        gamma = self.param("gamma", nn.initializers.zeros, (), jnp.float32)
        return (gamma.astype(self.dtype) * o + x).astype(self.dtype)
