"""BN / cBN unit tests (SURVEY.md §4: zero-mean/unit-var pre-γβ; pop stats EMA)."""

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from biggan_tpu.ops.norm import BatchNorm, ConditionalBatchNorm


def test_batchnorm_normalizes(rng):
    x = jax.random.normal(rng, (8, 4, 4, 16), jnp.float32) * 3.0 + 2.0
    bn = BatchNorm()
    variables = bn.init(jax.random.PRNGKey(0), x)
    y, mutated = bn.apply(variables, x, use_running_average=False, mutable=["batch_stats"])
    y = np.asarray(y)
    np.testing.assert_allclose(y.mean(axis=(0, 1, 2)), 0.0, atol=1e-4)
    np.testing.assert_allclose(y.std(axis=(0, 1, 2)), 1.0, atol=1e-3)
    # pop stats moved toward batch stats: mean = 0.9*0 + 0.1*batch_mean
    np.testing.assert_allclose(
        np.asarray(mutated["batch_stats"]["mean"]),
        0.1 * np.asarray(x).mean(axis=(0, 1, 2)),
        rtol=1e-4,
    )


def test_cbn_normalizes_and_conditions(rng):
    x = jax.random.normal(rng, (8, 4, 4, 16), jnp.float32) * 2.0 - 1.0
    cond = jax.random.normal(jax.random.PRNGKey(1), (8, 20), jnp.float32)
    cbn = ConditionalBatchNorm()
    variables = cbn.init(jax.random.PRNGKey(0), x, cond)
    y, _ = cbn.apply(variables, x, cond, use_running_average=False, mutable=["batch_stats"])
    assert y.shape == x.shape
    # the γ/β projection kernels are zero-init (γ≈1, β≈0 at step 0) so give
    # them nonzero values before checking cond-dependence
    variables = jax.tree.map(
        lambda v: v + 0.05 if v.ndim == 2 else v, variables
    )
    y, _ = cbn.apply(variables, x, cond, use_running_average=False, mutable=["batch_stats"])
    # different cond ⇒ different output (γ/β are cond-dependent)
    y2, _ = cbn.apply(variables, x, cond + 1.0, use_running_average=False, mutable=["batch_stats"])
    assert not np.allclose(np.asarray(y), np.asarray(y2))


def test_cbn_eval_uses_population_stats(rng):
    x = jax.random.normal(rng, (8, 4, 4, 16), jnp.float32)
    cond = jnp.zeros((8, 20), jnp.float32)
    cbn = ConditionalBatchNorm()
    variables = cbn.init(jax.random.PRNGKey(0), x, cond)
    # eval with fresh (zeros/ones) pop stats: output = x·γ(0)+β(0) ≈ x (γ init → 1)
    y = cbn.apply(variables, x, cond, use_running_average=True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-4)


def test_cross_replica_moments_match_global_batch():
    """8-device sharded BN moments == single-device global-batch moments."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devs = jax.devices()
    assert len(devs) >= 8, "conftest should provide 8 CPU devices"
    x = jax.random.normal(jax.random.PRNGKey(0), (16, 4, 4, 8), jnp.float32) * 2.0 + 1.0
    bn = BatchNorm()
    variables = bn.init(jax.random.PRNGKey(0), x)

    y_ref, mut_ref = bn.apply(variables, x, use_running_average=False, mutable=["batch_stats"])

    mesh = Mesh(np.array(devs[:8]), ("data",))
    x_sharded = jax.device_put(x, NamedSharding(mesh, P("data")))

    @jax.jit
    def sharded_apply(variables, x):
        return bn.apply(variables, x, use_running_average=False, mutable=["batch_stats"])

    y_shard, mut_shard = sharded_apply(variables, x_sharded)
    np.testing.assert_allclose(np.asarray(y_shard), np.asarray(y_ref), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(mut_shard["batch_stats"]["mean"]),
        np.asarray(mut_ref["batch_stats"]["mean"]),
        atol=1e-6,
    )


class TestPinnedResidualBackward:
    """The opt_bwd custom VJP (pinned residuals, ops/norm.py) must be a pure
    performance change: outputs, gradients, and state updates identical to
    naive autodiff within float32 tolerance."""

    def _grads(self, module_kw, opt_bwd, cbn=False, axis_name=None, shard=None):
        rng = jax.random.PRNGKey(3)
        x = jax.random.normal(rng, (8, 4, 4, 6), jnp.float32) * 1.7 + 0.3
        cond = jax.random.normal(jax.random.PRNGKey(4), (8, 5), jnp.float32)
        mod = (ConditionalBatchNorm if cbn else BatchNorm)(opt_bwd=opt_bwd, **module_kw)
        args = (x, cond) if cbn else (x,)
        variables = mod.init(jax.random.PRNGKey(5), *args)

        def loss(params, x):
            a = (x, cond) if cbn else (x,)
            y, mut = mod.apply(
                {**variables, "params": params} if params else variables,
                *a, use_running_average=False, axis_name=axis_name,
                mutable=["batch_stats"],
            )
            # nonlinear loss so dy varies per element
            return jnp.sum(y * jnp.cos(y)), (y, mut)

        params = variables.get("params", {})
        (val, (y, mut)), grads = jax.value_and_grad(loss, argnums=(0, 1), has_aux=True)(
            params, x
        )
        return val, y, mut["batch_stats"], grads

    @pytest.mark.parametrize("cbn", [False, True])
    def test_grad_parity_vs_autodiff(self, cbn):
        val_a, y_a, stats_a, (gp_a, gx_a) = self._grads({}, opt_bwd=True, cbn=cbn)
        val_b, y_b, stats_b, (gp_b, gx_b) = self._grads({}, opt_bwd=False, cbn=cbn)
        np.testing.assert_allclose(np.asarray(y_a), np.asarray(y_b), atol=1e-5)
        np.testing.assert_allclose(float(val_a), float(val_b), rtol=1e-5)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4),
            (stats_a, gp_a, gx_a), (stats_b, gp_b, gx_b),
        )

    def test_grad_parity_cross_replica(self):
        """Explicit axis_name path: pmean'd moment corrections in the custom
        backward must match autodiff of the pmean'd forward (shard_map)."""
        from functools import partial
        from jax.sharding import Mesh, PartitionSpec as P
        from jax import shard_map

        devs = jax.devices()[:8]
        mesh = Mesh(np.array(devs), ("data",))
        x = jax.random.normal(jax.random.PRNGKey(7), (16, 4, 4, 6), jnp.float32) * 2.0

        results = {}
        for opt_bwd in (True, False):
            bn = BatchNorm(opt_bwd=opt_bwd)
            variables = bn.init(jax.random.PRNGKey(8), x)

            def loss(params, x):
                y, _ = bn.apply(  # noqa: B023
                    {**variables, "params": params}, x,  # noqa: B023
                    use_running_average=False, axis_name="data",
                    mutable=["batch_stats"],
                )
                return jax.lax.psum(jnp.sum(y * jnp.sin(y)), "data")

            @jax.jit
            @partial(
                shard_map, mesh=mesh,
                in_specs=(P(), P("data")), out_specs=(P(), P("data")),
                check_vma=False,
            )
            def grad_fn(params, x):
                g_params, g_x = jax.grad(loss, argnums=(0, 1))(params, x)
                # replicated params: psum the per-device partials
                return jax.tree.map(lambda g: jax.lax.psum(g, "data"), g_params), g_x

            gp, gx_sharded = grad_fn(variables["params"], x)
            results[opt_bwd] = (gp, gx_sharded)

        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4),
            results[True], results[False],
        )
