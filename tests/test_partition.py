"""Multi-chip SPMD partitioning of the Pallas kernels (VERDICT r3 #2).

Each Pallas kernel carries a ``custom_partitioning`` batch-dim rule
(:mod:`biggan_tpu.kernels.partition`). On the 8-device CPU mesh the
kernels run in interpret mode, but the partitioner path is the REAL one:
these tests verify that (a) batch-sharded operands compile with NO
all-gather in the HLO (the GSPMD fallback this module exists to
prevent), (b) per-shard execution matches single-device numerics, and
(c) the gradient path partitions too.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@pytest.fixture(scope="module")
def mesh():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs the 8-device CPU mesh (conftest sets XLA_FLAGS)")
    return Mesh(np.array(devs[:8]).reshape(8), ("data",))


def _no_gather(hlo_text):
    return "all-gather" not in hlo_text and "all_gather" not in hlo_text


class TestFlashAttentionPartition:
    def _qkv(self, b=16, n=64, m=16, d=8, dv=16):
        rng = np.random.RandomState(0)
        return (
            jnp.asarray(rng.randn(b, n, d), jnp.float32),
            jnp.asarray(rng.randn(b, m, d), jnp.float32),
            jnp.asarray(rng.randn(b, m, dv), jnp.float32),
        )

    def test_forward_sharded_no_gather(self, mesh):
        from biggan_tpu.kernels.attention_pallas import flash_attention
        from biggan_tpu.ops.attn import attention_xla

        q, k, v = self._qkv()
        sh = NamedSharding(mesh, P("data"))
        f = jax.jit(flash_attention, in_shardings=(sh, sh, sh), out_shardings=sh)
        hlo = f.lower(q, k, v).compile().as_text()
        assert _no_gather(hlo), "batch-sharded attention must not all-gather"
        out = f(*(jax.device_put(x, sh) for x in (q, k, v)))
        assert out.sharding.spec == P("data")
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(attention_xla(q, k, v)),
            rtol=1e-5, atol=1e-5)

    def test_gradient_sharded_matches_single_device(self, mesh):
        from biggan_tpu.kernels.attention_pallas import flash_attention

        q, k, v = self._qkv()
        sh = NamedSharding(mesh, P("data"))

        def loss(q, k, v):
            return jnp.sum(flash_attention(q, k, v) ** 2)

        grads_single = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(q, k, v)
        g = jax.jit(jax.grad(loss, argnums=(0, 1, 2)),
                    in_shardings=(sh, sh, sh))
        hlo = g.lower(q, k, v).compile().as_text()
        assert _no_gather(hlo), "attention backward must not all-gather"
        grads_mesh = g(*(jax.device_put(x, sh) for x in (q, k, v)))
        for gs, gm in zip(grads_single, grads_mesh):
            np.testing.assert_allclose(
                np.asarray(gs), np.asarray(gm), rtol=1e-4, atol=1e-4)


class TestConvDeconvPartition:
    def test_conv3x3_sharded(self, mesh):
        from biggan_tpu.kernels.conv_pallas import conv3x3

        rng = np.random.RandomState(1)
        x = jnp.asarray(rng.randn(16, 64, 8, 128), jnp.float32)
        w = jnp.asarray(rng.randn(3, 3, 128, 8) * 0.05, jnp.float32)
        b = jnp.asarray(rng.randn(8) * 0.1, jnp.float32)
        sh = NamedSharding(mesh, P("data"))
        rep = NamedSharding(mesh, P())
        f = jax.jit(conv3x3, in_shardings=(sh, rep, rep), out_shardings=sh)
        hlo = f.lower(x, w, b).compile().as_text()
        assert _no_gather(hlo), "batch-sharded conv must not all-gather x"
        out = f(jax.device_put(x, sh), w, b)
        ref = jax.jit(conv3x3)(x, w, b)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

    def test_deconv3x3s2_sharded(self, mesh):
        from biggan_tpu.kernels.deconv_pallas import deconv3x3s2

        rng = np.random.RandomState(2)
        x = jnp.asarray(rng.randn(16, 32, 8, 256), jnp.float32)
        w = jnp.asarray(rng.randn(3, 3, 256, 8) * 0.05, jnp.float32)
        b = jnp.asarray(rng.randn(8) * 0.1, jnp.float32)
        sh = NamedSharding(mesh, P("data"))
        rep = NamedSharding(mesh, P())
        f = jax.jit(deconv3x3s2, in_shardings=(sh, rep, rep), out_shardings=sh)
        hlo = f.lower(x, w, b).compile().as_text()
        assert _no_gather(hlo), "batch-sharded deconv must not all-gather x"
        out = f(jax.device_put(x, sh), w, b)
        ref = jax.jit(deconv3x3s2)(x, w, b)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)


class TestPowerIterPartition:
    def test_replicated_rule_under_mesh(self, mesh):
        """SN power iteration has no batch axis; its rule replicates W and
        must agree with the single-device kernel under a mesh jit."""
        from biggan_tpu.kernels.power_iter_pallas import power_iteration_fused

        rng = np.random.RandomState(3)
        w = jnp.asarray(rng.randn(256, 64), jnp.float32)
        u = jnp.asarray(rng.randn(64), jnp.float32)
        rep = NamedSharding(mesh, P())
        f = jax.jit(power_iteration_fused, in_shardings=(rep, rep))
        sigma_m, u_m = f(jax.device_put(w, rep), jax.device_put(u, rep))
        sigma_s, u_s = jax.jit(power_iteration_fused)(w, u)
        np.testing.assert_allclose(float(sigma_m), float(sigma_s), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(u_m), np.asarray(u_s), rtol=1e-5)


class TestTrainStepPallasOnMesh:
    @pytest.mark.slow
    def test_train_step_forced_pallas_over_mesh(self, mesh):
        """One full sharded train step with EVERY impl forced to Pallas —
        the real-TPU default configuration finally exercised under a mesh
        (VERDICT r3 weak #4). Uses shapes large enough that attention and
        SN actually route through the kernels."""
        from biggan_tpu.configs import get_config
        from biggan_tpu.parallel.sharding import batch_sharding, replicate
        from biggan_tpu.training.train_state import create_train_state
        from biggan_tpu.training.train_step import make_train_step
        from biggan_tpu.kernels.conv_pallas import set_conv_impl

        cfg = get_config(
            "biggan128_paper", img_size=64, ch=16, batch_size=16,
            num_classes=10, dataset="synthetic", attn_impl="pallas",
            sn_impl="pallas", n_critic=1,
        )
        try:
            set_conv_impl("pallas")
            state = replicate(create_train_state(cfg, jax.random.PRNGKey(0)), mesh)
            step = jax.jit(make_train_step(cfg), donate_argnums=0)
            rng = np.random.RandomState(0)
            batch = jax.device_put(
                {
                    "image": rng.randint(
                        0, 256, (1, 16, 64, 64, 3)).astype(np.uint8),
                    "label": rng.randint(0, 10, (1, 16)).astype(np.int32),
                },
                batch_sharding(mesh, batch_dim=1),
            )
            state, metrics = step(state, batch)
            assert np.isfinite(float(metrics["d_loss"]))
            assert np.isfinite(float(metrics["g_loss"]))
        finally:
            set_conv_impl("auto")


class TestBatchSpecNormalization:
    def test_non_named_sharding_proposal_normalizes_to_replicated(self, mesh):
        """A positional/GSPMD shard proposal must not pass through
        unnormalized — the per-shard kernel can't handle non-batch-dim
        splits (r4b review finding): normalize to replicated instead."""
        import types

        from jax.sharding import SingleDeviceSharding

        from biggan_tpu.kernels.partition import _batch_spec

        fake = types.SimpleNamespace(
            shape=(16, 8),
            sharding=SingleDeviceSharding(jax.devices()[0]),
        )
        out = _batch_spec(mesh, fake, batch_dim=0)
        assert isinstance(out, NamedSharding)
        assert out.spec == P() or all(a is None for a in out.spec)

    def test_non_batch_dim_axis_is_stripped(self, mesh):
        from biggan_tpu.kernels.partition import _batch_spec
        import types

        fake = types.SimpleNamespace(
            shape=(16, 8),
            sharding=NamedSharding(mesh, P(None, "data")),
        )
        out = _batch_spec(mesh, fake, batch_dim=0)
        # the non-batch "data" split is gone; batch dim keeps its (absent) axis
        assert tuple(out.spec) in ((), (None,), (None, None))

    def test_batch_dim_axis_is_kept(self, mesh):
        from biggan_tpu.kernels.partition import _batch_spec
        import types

        fake = types.SimpleNamespace(
            shape=(16, 8),
            sharding=NamedSharding(mesh, P("data", None)),
        )
        out = _batch_spec(mesh, fake, batch_dim=0)
        assert out.spec[0] == "data"
