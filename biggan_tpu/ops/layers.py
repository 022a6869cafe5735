"""Conv / deconv / dense layers with optional spectral normalization.

TPU-native counterparts of the reference's ``conv`` / ``deconv`` /
``fully_connected`` (ref ``ops.py:~40-135``):

- NHWC layout, HWIO kernels — the layouts XLA tiles best onto the MXU.
- Explicit symmetric padding + VALID conv, matching the reference's
  manual-pad-then-VALID scheme (ref ``ops.py:~40-75``) instead of TF SAME's
  asymmetric padding; this keeps activations bit-comparable for imported
  checkpoints.
- When ``use_sn``: the kernel is wrapped by
  :func:`biggan_tpu.ops.sn.spectral_normalize` with its power-iteration
  ``u`` carried in the ``sn_u`` collection (mutated only when the module is
  called with ``update_sn=True``, i.e. during training).
- Mixed precision: params live in float32; compute runs in ``dtype``
  (bfloat16 by default on TPU) — inputs and the (already σ-divided) kernel
  are cast at call time.

Init is truncated-normal(0, 0.02) like the reference's ``weight_init``
(ref ``ops.py:~8-12``); orthogonal regularization is applied at loss time
over the params pytree (see :func:`biggan_tpu.ops.losses.orthogonal_regularization`)
rather than via per-layer regularizer hooks.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from biggan_tpu.ops.sn import spectral_normalize

# Reference weight_init: truncated_normal(mean=0, stddev=0.02), ops.py:~8.
kernel_init = nn.initializers.truncated_normal(stddev=0.02)


def _pair(v) -> tuple[int, int]:
    if isinstance(v, int):
        return (v, v)
    a, b = v
    return (int(a), int(b))


class _SNMixin:
    """Shared helper: fetch a kernel, spectrally normalize if requested."""

    def _maybe_sn(self, w: jax.Array, use_sn: bool, update_sn: bool) -> jax.Array:
        if not use_sn:
            return w
        u = self.variable(
            "sn_u",
            "u",
            lambda: jax.random.normal(self.make_rng("params"), (w.shape[-1],), jnp.float32),
        )
        w_sn, u_next = spectral_normalize(w, u.value, update=update_sn)
        if update_sn and not self.is_initializing():
            u.value = u_next
        return w_sn

    def _compute_weight(self, w: jax.Array) -> jax.Array:
        """Cast the (possibly normalized) f32 master kernel to the compute
        dtype — optionally behind an optimization barrier so XLA
        materializes the bf16 copy in HBM instead of streaming the f32
        master into VMEM per use (the HLO byte map shows the f32 kernel
        prefetch slices dominate the step's batch-independent traffic;
        see NEXT.md / benchmarks/hlo_bytes.py)."""
        w_c = w.astype(self.dtype)
        if getattr(self, "materialize_weights", False) and w_c.dtype != w.dtype:
            w_c = jax.lax.optimization_barrier(w_c)
        return w_c


class SNDense(nn.Module, _SNMixin):
    """Dense layer with optional SN (ref ``fully_connected``, ops.py:~113-135)."""

    features: int
    use_bias: bool = True
    use_sn: bool = False
    materialize_weights: bool = False
    kernel_init: nn.initializers.Initializer = kernel_init
    bias_init: nn.initializers.Initializer = nn.initializers.zeros
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, update_sn: bool = False) -> jax.Array:
        w = self.param("kernel", self.kernel_init, (x.shape[-1], self.features), jnp.float32)
        w = self._maybe_sn(w, self.use_sn, update_sn)
        y = jnp.dot(x.astype(self.dtype), self._compute_weight(w), preferred_element_type=self.dtype)
        if self.use_bias:
            b = self.param("bias", self.bias_init, (self.features,), jnp.float32)
            y = y + b.astype(self.dtype)
        return y


class SNConv2D(nn.Module, _SNMixin):
    """3×3/1×1 conv with symmetric pad + VALID and optional SN.

    Mirrors the reference ``conv`` (ops.py:~40-75): explicit zero padding of
    ``(k-1)//2`` on each side, then a VALID convolution — *not* TF SAME.
    """

    features: int
    kernel_size: Sequence[int] | int = 3
    strides: Sequence[int] | int = 1
    use_bias: bool = True
    use_sn: bool = False
    materialize_weights: bool = False
    pad: int | None = None  # default: (k-1)//2 symmetric
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, update_sn: bool = False) -> jax.Array:
        kh, kw = _pair(self.kernel_size)
        sh, sw = _pair(self.strides)
        w = self.param("kernel", kernel_init, (kh, kw, x.shape[-1], self.features), jnp.float32)
        w = self._maybe_sn(w, self.use_sn, update_sn)
        ph = (kh - 1) // 2 if self.pad is None else self.pad
        pw = (kw - 1) // 2 if self.pad is None else self.pad
        from biggan_tpu.kernels.conv_pallas import conv3x3, use_pallas_conv

        if use_pallas_conv(x.shape, (kh, kw), (sh, sw), self.pad):
            # conv_impl="pallas" only: the im2col kernel wins this shape
            # class in isolation but forfeits XLA's epilogue fusions
            # in-step (BENCH_NOTES r3d); identical math, parity-tested.
            bias = (self.param("bias", nn.initializers.zeros,
                               (self.features,), jnp.float32)
                    if self.use_bias else None)
            return conv3x3(
                x.astype(self.dtype), self._compute_weight(w),
                None if bias is None else bias.astype(self.dtype))
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            self._compute_weight(w),
            window_strides=(sh, sw),
            padding=((ph, ph), (pw, pw)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=self.dtype,
        )
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            y = y + b.astype(self.dtype)
        return y


class SNConvTranspose2D(nn.Module, _SNMixin):
    """Transposed conv, kernel 3 stride 2 — the reference G's upsampler.

    Matches TF ``conv2d_transpose(..., padding='SAME')`` output sizing
    (``H → H·stride``; ref ``deconv``, ops.py:~78-110). Kernel stored HWIO
    (out features last) for a uniform TPU-friendly layout; **spectral norm
    runs over the TF deconv layout** — the reference stores deconv kernels
    ``[H, W, out, in]`` and ``spectral_norm`` reshapes to ``[-1, in]``
    (ref ops.py:~403: reshape to ``[-1, shape[-1]]``), so σ is the top
    singular value of the ``[H·W·out, in]`` matrix and ``u`` has size
    ``C_in``. We transpose to that layout before the power iteration so σ —
    and therefore every activation under an imported reference checkpoint —
    matches TF bit-for-bit-ish.
    """

    features: int
    kernel_size: Sequence[int] | int = 3
    strides: Sequence[int] | int = 2
    use_bias: bool = True
    use_sn: bool = False
    materialize_weights: bool = False
    dtype: jnp.dtype = jnp.float32

    def _maybe_sn(self, w: jax.Array, use_sn: bool, update_sn: bool) -> jax.Array:
        if not use_sn:
            return w
        c_in = w.shape[2]
        u = self.variable(
            "sn_u",
            "u",
            lambda: jax.random.normal(self.make_rng("params"), (c_in,), jnp.float32),
        )
        w_hwoi = jnp.transpose(w, (0, 1, 3, 2))  # HWIO → HWOI (TF deconv layout)
        w_sn, u_next = spectral_normalize(w_hwoi, u.value, update=update_sn)
        if update_sn and not self.is_initializing():
            u.value = u_next
        return jnp.transpose(w_sn, (0, 1, 3, 2))

    @nn.compact
    def __call__(self, x: jax.Array, update_sn: bool = False) -> jax.Array:
        kh, kw = _pair(self.kernel_size)
        sh, sw = _pair(self.strides)
        w = self.param("kernel", kernel_init, (kh, kw, x.shape[-1], self.features), jnp.float32)
        w = self._maybe_sn(w, self.use_sn, update_sn)
        from biggan_tpu.kernels.deconv_pallas import deconv3x3s2, use_pallas_deconv

        if use_pallas_deconv(x.shape, (kh, kw), (sh, sw)):
            # Polyphase Pallas upsampler: same TF-grad scatter semantics
            # (the kernel consumes the UNflipped w), bias fused.
            bias = (self.param("bias", nn.initializers.zeros,
                               (self.features,), jnp.float32)
                    if self.use_bias else None)
            return deconv3x3s2(
                x.astype(self.dtype), self._compute_weight(w),
                None if bias is None else bias.astype(self.dtype))
        # TF's conv2d_transpose is the *gradient* of conv (spatially flipped
        # kernel); lax.conv_transpose convolves unflipped. Flip here so
        # outputs — and imported reference checkpoints — match TF exactly
        # (verified in tests/test_tf_parity.py).
        y = jax.lax.conv_transpose(
            x.astype(self.dtype),
            self._compute_weight(w[::-1, ::-1]),
            strides=(sh, sw),
            padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=self.dtype,
        )
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            y = y + b.astype(self.dtype)
        return y
