"""Parity tests: Pallas kernels vs the XLA reference paths.

Runs in interpreter mode on the CPU test platform (the kernels detect the
backend); the same code compiles via Mosaic on the real chip.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from biggan_tpu.kernels.attention_pallas import flash_attention
from biggan_tpu.kernels.power_iter_pallas import power_iteration_fused, supports
from biggan_tpu.ops.attn import attention_xla
from biggan_tpu.ops.sn import power_iteration, spectral_normalize


class TestFlashAttention:
    @pytest.mark.parametrize("n,m,d,dv", [(64, 16, 8, 16), (256, 64, 16, 32)])
    def test_forward_parity(self, rng, n, m, d, dv):
        kq, kk, kv = jax.random.split(rng, 3)
        q = jax.random.normal(kq, (2, n, d))
        k = jax.random.normal(kk, (2, m, d))
        v = jax.random.normal(kv, (2, m, dv))
        out_pallas = flash_attention(q, k, v)
        out_xla = attention_xla(q, k, v)
        np.testing.assert_allclose(out_pallas, out_xla, rtol=1e-5, atol=1e-5)

    @pytest.mark.slow
    def test_long_context_n16384_parity_and_block_math(self, rng):
        """Evidence for the N=16384 claim (ops/attn.py: HBM stays flat if
        attention moves to 128×128; SURVEY §5 long-context row — VERDICT
        r4 next #6): the block picker must tile N=16384 × M=4096 inside
        its 4 MB score-tile VMEM budget, and the kernel must match XLA
        at that shape. Interpret mode here; the on-chip timing row is
        ``benchmarks/attn_probe.py --shapes attn128_c96``."""
        from biggan_tpu.kernels.attention_pallas import _pick_block_n

        n, m = 16384, 4096
        bn = _pick_block_n(n, m)
        # largest block with bn·m·4B ≤ 4 MB that divides n — exactly 256
        assert bn == 256, bn
        assert bn * m * 4 <= 4 * 1024 * 1024
        kq, kk, kv = jax.random.split(rng, 3)
        q = jax.random.normal(kq, (1, n, 8))
        k = jax.random.normal(kk, (1, m, 8))
        v = jax.random.normal(kv, (1, m, 16))
        out = flash_attention(q, k, v)
        ref = attention_xla(q, k, v)
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)

    def test_gradient_parity(self, rng):
        kq, kk, kv = jax.random.split(rng, 3)
        q = jax.random.normal(kq, (1, 64, 8))
        k = jax.random.normal(kk, (1, 16, 8))
        v = jax.random.normal(kv, (1, 16, 16))

        def loss_pallas(q, k, v):
            return jnp.sum(jnp.square(flash_attention(q, k, v)))

        def loss_xla(q, k, v):
            return jnp.sum(jnp.square(attention_xla(q, k, v)))

        gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, k, v)
        gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
        for a, b, name in zip(gp, gx, "qkv"):
            np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4, err_msg=f"d{name}")

    def test_multiblock_accumulation(self, rng):
        """N split into several q-blocks must still match (dk/dv accumulate
        across the revisited output block)."""
        kq, kk, kv = jax.random.split(rng, 3)
        q = jax.random.normal(kq, (2, 32, 8))
        k = jax.random.normal(kk, (2, 8, 8))
        v = jax.random.normal(kv, (2, 8, 8))
        # force multiple blocks by calling the underlying op with block_n=8
        from biggan_tpu.kernels.attention_pallas import _flash_attention

        out = _flash_attention(q, k, v, 8)
        np.testing.assert_allclose(out, attention_xla(q, k, v), rtol=1e-5, atol=1e-5)

        g = jax.grad(lambda q, k, v: jnp.sum(jnp.sin(_flash_attention(q, k, v, 8))), argnums=(0, 1, 2))(q, k, v)
        g_ref = jax.grad(lambda q, k, v: jnp.sum(jnp.sin(attention_xla(q, k, v))), argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(g, g_ref):
            np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)

    def test_odd_shape_falls_back(self, rng):
        q = jax.random.normal(rng, (1, 7, 4))  # N=7: no valid tiling
        k = jax.random.normal(rng, (1, 3, 4))
        v = jax.random.normal(rng, (1, 3, 4))
        np.testing.assert_allclose(
            flash_attention(q, k, v), attention_xla(q, k, v), rtol=1e-5, atol=1e-5
        )

    def test_v1_variant_parity(self, rng):
        """The archived v1 kernel (probe baseline) stays correct."""
        from biggan_tpu.kernels.attention_pallas import set_attn_tuning

        kq, kk, kv = jax.random.split(rng, 3)
        q = jax.random.normal(kq, (1, 64, 8))
        k = jax.random.normal(kk, (1, 16, 8))
        v = jax.random.normal(kv, (1, 16, 16))
        prev = set_attn_tuning(variant="v1")
        try:
            out = flash_attention(q, k, v)
            g = jax.grad(lambda q: jnp.sum(flash_attention(q, k, v) ** 2))(q)
        finally:
            set_attn_tuning(*prev)
        np.testing.assert_allclose(out, attention_xla(q, k, v), rtol=1e-5, atol=1e-5)
        g_ref = jax.grad(lambda q: jnp.sum(attention_xla(q, k, v) ** 2))(q)
        np.testing.assert_allclose(g, g_ref, rtol=1e-4, atol=1e-4)

    def test_bf16_score_tile_deviation(self, rng):
        """attn_score_dtype=bfloat16 (labeled deviation): close to the exact
        path, finite gradients, and restores cleanly."""
        from biggan_tpu.kernels.attention_pallas import set_attn_tuning

        kq, kk, kv = jax.random.split(rng, 3)
        q = jax.random.normal(kq, (1, 64, 8))
        k = jax.random.normal(kk, (1, 16, 8))
        v = jax.random.normal(kv, (1, 16, 16))
        ref = attention_xla(q, k, v)
        prev = set_attn_tuning(score_dtype="bfloat16")
        try:
            out = flash_attention(q, k, v)
            g = jax.grad(lambda q: jnp.sum(flash_attention(q, k, v) ** 2))(q)
        finally:
            set_attn_tuning(*prev)
        # bf16 softmax weights: ~1e-2 relative — loose but bounded
        np.testing.assert_allclose(out, ref, rtol=5e-2, atol=5e-2)
        assert bool(jnp.all(jnp.isfinite(g)))
        # knob restored: exact again
        np.testing.assert_allclose(
            flash_attention(q, k, v), ref, rtol=1e-5, atol=1e-5)

    def test_set_attn_tuning_validation(self):
        from biggan_tpu.kernels.attention_pallas import set_attn_tuning

        with pytest.raises(ValueError):
            set_attn_tuning(variant="v3")
        with pytest.raises(ValueError):
            set_attn_tuning(score_dtype="fp8")

    def test_partial_tuning_call_preserves_block_override(self):
        """build_models sets score_dtype only — it must not silently wipe
        a block size a probe pinned (r4b review finding)."""
        from biggan_tpu.kernels import attention_pallas as ap

        prev = ap.set_attn_tuning(block_n=64)
        try:
            ap.set_attn_tuning(score_dtype="float32")  # partial call
            assert ap._BLOCK_N_OVERRIDE == 64
            ap.set_attn_tuning(variant="v2")  # partial call
            assert ap._BLOCK_N_OVERRIDE == 64
            ap.set_attn_tuning(block_n=None)  # explicit None clears
            assert ap._BLOCK_N_OVERRIDE is None
        finally:
            ap.set_attn_tuning(*prev)

    def test_bfloat16(self, rng):
        q = jax.random.normal(rng, (1, 64, 8), jnp.bfloat16)
        k = jax.random.normal(rng, (1, 16, 8), jnp.bfloat16)
        v = jax.random.normal(rng, (1, 16, 16), jnp.bfloat16)
        out = flash_attention(q, k, v)
        assert out.dtype == jnp.bfloat16
        np.testing.assert_allclose(
            out.astype(jnp.float32),
            attention_xla(q, k, v).astype(jnp.float32),
            rtol=2e-2, atol=2e-2,
        )


class TestPowerIterFused:
    @pytest.mark.parametrize("shape", [(64, 32), (9 * 64, 128), (5, 8)])
    def test_sigma_parity(self, rng, shape):
        w = jax.random.normal(rng, shape)
        u = jax.random.normal(jax.random.fold_in(rng, 1), (shape[-1],))
        sigma_ref, u_ref = power_iteration(w, u)
        sigma_fused, u_fused = power_iteration_fused(w, u)
        np.testing.assert_allclose(sigma_fused, sigma_ref, rtol=1e-5)
        np.testing.assert_allclose(u_fused, u_ref, rtol=1e-4, atol=1e-5)

    def test_sigma_converges_to_true_singular_value(self, rng):
        w = jax.random.normal(rng, (96, 48))
        true_sigma = float(np.linalg.svd(np.asarray(w), compute_uv=False)[0])
        u = jax.random.normal(jax.random.fold_in(rng, 1), (48,))
        for _ in range(50):
            sigma, u = power_iteration_fused(w, u)
        assert abs(float(sigma) - true_sigma) / true_sigma < 1e-3

    def test_unsupported_shape(self):
        assert not supports((16, 4096))
        assert supports((4096, 1536))

    def test_grad_parity_through_spectral_normalize(self, rng):
        """End-to-end: w/σ(w) gradient identical between impls."""
        w = jax.random.normal(rng, (4, 4, 8, 16))
        u = jax.random.normal(jax.random.fold_in(rng, 1), (16,))

        def loss(w, impl):
            w_sn, _ = spectral_normalize(w, u, impl=impl)
            return jnp.sum(jnp.square(w_sn) * jnp.cos(w_sn))

        g_xla = jax.grad(lambda w: loss(w, "xla"))(w)
        g_pallas = jax.grad(lambda w: loss(w, "pallas"))(w)
        np.testing.assert_allclose(g_pallas, g_xla, rtol=1e-4, atol=1e-5)

    def test_u_state_updates_match(self, rng):
        w = jax.random.normal(rng, (32, 16))
        u = jax.random.normal(jax.random.fold_in(rng, 1), (16,))
        _, u_xla = spectral_normalize(w, u, impl="xla")
        _, u_pallas = spectral_normalize(w, u, impl="pallas")
        np.testing.assert_allclose(u_pallas, u_xla, rtol=1e-5, atol=1e-6)
        # eval mode must not advance u under either impl
        _, u_frozen = spectral_normalize(w, u, update=False, impl="pallas")
        np.testing.assert_allclose(u_frozen, u)


class TestPallasConv3x3:
    """Parity of the thin-channel conv kernel (kernels/conv_pallas.py)
    vs the XLA conv it replaces, across all three in-kernel strategies."""

    @staticmethod
    def _ref(x, w, b):
        y = jax.lax.conv_general_dilated(
            x, w, window_strides=(1, 1), padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=x.dtype)
        return y + b

    @pytest.mark.parametrize("variant", ["im2col", "im2col_pad", "acc9"])
    @pytest.mark.parametrize("shape", [(2, 64, 64, 96, 96), (1, 64, 32, 40, 24)])
    def test_forward_parity(self, rng, variant, shape):
        from biggan_tpu.kernels.conv_pallas import conv3x3

        B, H, W, ci, co = shape
        kx, kw, kb = jax.random.split(rng, 3)
        x = jax.random.normal(kx, (B, H, W, ci))
        w = jax.random.normal(kw, (3, 3, ci, co)) * 0.05
        b = jax.random.normal(kb, (co,)) * 0.1
        np.testing.assert_allclose(
            conv3x3(x, w, b, variant=variant), self._ref(x, w, b),
            rtol=2e-4, atol=2e-4)

    def test_gradient_parity(self, rng):
        from biggan_tpu.kernels.conv_pallas import conv3x3

        kx, kw, kb = jax.random.split(rng, 3)
        x = jax.random.normal(kx, (1, 64, 16, 24))
        w = jax.random.normal(kw, (3, 3, 24, 16)) * 0.05
        b = jax.random.normal(kb, (16,)) * 0.1

        gp = jax.grad(lambda *a: jnp.sum(jnp.sin(conv3x3(*a))),
                      argnums=(0, 1, 2))(x, w, b)
        gr = jax.grad(lambda x, w, b: jnp.sum(jnp.sin(self._ref(x, w, b))),
                      argnums=(0, 1, 2))(x, w, b)
        for a, r, name in zip(gp, gr, ("dx", "dw", "db")):
            np.testing.assert_allclose(a, r, rtol=1e-4, atol=1e-4,
                                       err_msg=name)

    def test_supported_gating(self):
        from biggan_tpu.kernels.conv_pallas import supported

        assert supported((8, 64, 64, 192), (3, 3), (1, 1), 1)
        assert supported((8, 64, 64, 128), (3, 3), (1, 1), None)
        # XLA wins outside the 128..256-channel 64px-class band
        # (measured: 32.5% > 25% at 128^2x96, 90% MXU at 32^2x384)
        assert not supported((8, 128, 128, 96), (3, 3), (1, 1), None)
        assert not supported((8, 32, 32, 384), (3, 3), (1, 1), None)
        assert not supported((8, 128, 128, 384), (3, 3), (1, 1), None)
        assert not supported((8, 64, 64, 192), (1, 1), (1, 1), None)
        assert not supported((8, 64, 64, 192), (3, 3), (2, 2), None)
        assert not supported((8, 64, 64, 192), (3, 3), (1, 1), 0)

    def test_layer_routes_through_pallas(self, rng):
        """SNConv2D output is impl-invariant on a supported shape."""
        from biggan_tpu.kernels.conv_pallas import set_conv_impl, use_pallas_conv
        from biggan_tpu.ops.layers import SNConv2D

        x = jax.random.normal(rng, (1, 64, 8, 128))
        layer = SNConv2D(features=8, kernel_size=3)
        params = layer.init(jax.random.PRNGKey(0), x)
        try:
            set_conv_impl("pallas")
            # guard against vacuity: the shape must actually route through
            # the kernel while impl is forced (ADVICE r3)
            assert use_pallas_conv(x.shape, (3, 3), (1, 1), None)
            y_pallas = layer.apply(params, x)
            set_conv_impl("xla")
            assert not use_pallas_conv(x.shape, (3, 3), (1, 1), None)
            y_xla = layer.apply(params, x)
        finally:
            set_conv_impl("auto")
        np.testing.assert_allclose(y_pallas, y_xla, rtol=1e-5, atol=1e-5)


class TestPallasDeconv:
    """Parity of the polyphase stride-2 deconv kernel
    (kernels/deconv_pallas.py) vs the lax.conv_transpose reference."""

    @staticmethod
    def _ref(x, w, b):
        y = jax.lax.conv_transpose(
            x, w[::-1, ::-1], strides=(2, 2), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=x.dtype)
        return y + b

    @pytest.mark.parametrize("shape", [(2, 32, 32, 48, 24), (1, 32, 16, 64, 32)])
    def test_forward_parity(self, rng, shape):
        from biggan_tpu.kernels.deconv_pallas import deconv3x3s2

        B, H, W, ci, co = shape
        kx, kw, kb = jax.random.split(rng, 3)
        x = jax.random.normal(kx, (B, H, W, ci))
        w = jax.random.normal(kw, (3, 3, ci, co)) * 0.05
        b = jax.random.normal(kb, (co,)) * 0.1
        np.testing.assert_allclose(
            deconv3x3s2(x, w, b), self._ref(x, w, b), rtol=2e-4, atol=2e-4)

    def test_gradient_parity(self, rng):
        from biggan_tpu.kernels.deconv_pallas import deconv3x3s2

        kx, kw, kb = jax.random.split(rng, 3)
        x = jax.random.normal(kx, (1, 32, 8, 24))
        w = jax.random.normal(kw, (3, 3, 24, 16)) * 0.05
        b = jax.random.normal(kb, (16,)) * 0.1
        gp = jax.grad(lambda *a: jnp.sum(jnp.sin(deconv3x3s2(*a))),
                      argnums=(0, 1, 2))(x, w, b)
        gr = jax.grad(lambda x, w, b: jnp.sum(jnp.sin(self._ref(x, w, b))),
                      argnums=(0, 1, 2))(x, w, b)
        for a, r, name in zip(gp, gr, ("dx", "dw", "db")):
            np.testing.assert_allclose(a, r, rtol=1e-4, atol=1e-4,
                                       err_msg=name)

    def test_layer_routes_through_pallas(self, rng):
        """SNConvTranspose2D output is impl-invariant on a supported shape."""
        from biggan_tpu.kernels.conv_pallas import set_conv_impl
        from biggan_tpu.kernels.deconv_pallas import use_pallas_deconv
        from biggan_tpu.ops.layers import SNConvTranspose2D

        x = jax.random.normal(rng, (1, 32, 8, 256))
        layer = SNConvTranspose2D(features=8)
        params = layer.init(jax.random.PRNGKey(0), x)
        try:
            set_conv_impl("pallas")
            # guard against vacuity: the shape must actually route through
            # the kernel while impl is forced (ADVICE r3)
            assert use_pallas_deconv(x.shape, (3, 3), (2, 2))
            y_pallas = layer.apply(params, x)
            set_conv_impl("xla")
            assert not use_pallas_deconv(x.shape, (3, 3), (2, 2))
            y_xla = layer.apply(params, x)
        finally:
            set_conv_impl("auto")
        np.testing.assert_allclose(y_pallas, y_xla, rtol=1e-5, atol=1e-5)
