"""Spectral-norm unit tests (SURVEY.md §4: SN converges to true σ; u mutates)."""

import jax
import jax.numpy as jnp
import numpy as np

from biggan_tpu.ops.sn import power_iteration, spectral_normalize


def test_power_iteration_converges_to_sigma_max(rng):
    w = jax.random.normal(rng, (64, 32), jnp.float32)
    true_sigma = np.linalg.svd(np.asarray(w), compute_uv=False)[0]
    u = jax.random.normal(jax.random.PRNGKey(1), (32,), jnp.float32)
    sigma, u = power_iteration(w, u, n_iter=50)
    np.testing.assert_allclose(float(sigma), float(true_sigma), rtol=1e-4)


def test_spectral_normalize_unit_sigma(rng):
    w = jax.random.normal(rng, (3, 3, 16, 32), jnp.float32) * 5.0
    u = jax.random.normal(jax.random.PRNGKey(1), (32,), jnp.float32)
    # run a few iterations to settle u, feeding it back (as training does);
    # 1 power-iter per forward (ref default) converges gradually, so the
    # tolerance is loose — the strict convergence check is the n_iter=50
    # test above.
    for _ in range(100):
        w_sn, u = spectral_normalize(w, u, update=True)
    sigma = np.linalg.svd(np.asarray(w_sn).reshape(-1, 32), compute_uv=False)[0]
    np.testing.assert_allclose(sigma, 1.0, rtol=1e-2)


def test_update_flag_freezes_u(rng):
    w = jax.random.normal(rng, (8, 8), jnp.float32)
    u = jax.random.normal(jax.random.PRNGKey(1), (8,), jnp.float32)
    _, u_frozen = spectral_normalize(w, u, update=False)
    np.testing.assert_array_equal(np.asarray(u_frozen), np.asarray(u))
    _, u_new = spectral_normalize(w, u, update=True)
    assert not np.allclose(np.asarray(u_new), np.asarray(u))


def test_sigma_gradient_flows_through_w_only(rng):
    w = jax.random.normal(rng, (16, 8), jnp.float32)
    u = jax.random.normal(jax.random.PRNGKey(1), (8,), jnp.float32)

    def f(w):
        sigma, _ = power_iteration(w, u, n_iter=3)
        return sigma

    g = jax.grad(f)(w)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0.0


def test_sigma_metrics_tree():
    """sigma_metrics: one σ per SN kernel, matching direct power iteration."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from biggan_tpu.ops.layers import SNDense
    from biggan_tpu.ops.sn import power_iteration, sigma_metrics

    mod = SNDense(8, use_sn=True)
    x = jnp.ones((2, 4))
    variables = mod.init(jax.random.PRNGKey(0), x)
    out = sigma_metrics(variables["params"], variables["sn_u"])
    assert len(out) == 1
    (key, sigma), = out.items()
    assert key == "sigma/"or key.startswith("sigma")
    w = variables["params"]["kernel"]
    expected, _ = power_iteration(w.reshape(-1, w.shape[-1]), variables["sn_u"]["u"])
    np.testing.assert_allclose(float(sigma), float(expected), rtol=1e-6)


def test_train_step_advances_u_once_per_update():
    """The D loss shares u across its two forwards (weight-pass CSE), so
    u advances exactly ONE power iteration per D update — and G's u one
    per G update. Deterministic: new_u == iterate(W_pre_update, u0)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from biggan_tpu.configs import GANConfig
    from biggan_tpu.ops.sn import power_iteration
    from biggan_tpu.training.train_state import create_train_state
    from biggan_tpu.training.train_step import make_train_step

    cfg = GANConfig(
        dataset="synthetic", img_size=32, ch=8, z_dim=16, num_classes=0,
        batch_size=4, compute_dtype="float32", random_flip=False, sn_impl="xla",
    )
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    step = jax.jit(make_train_step(cfg))
    batch = {
        "image": np.random.RandomState(0).rand(1, 4, 32, 32, 3).astype(np.float32) * 2 - 1
    }
    new_state, _ = step(state, batch)

    import flax.traverse_util as tu

    for net, prefix in (("d", None), ("g", None)):
        params = getattr(state, f"{net}_params")
        u_old = tu.flatten_dict(getattr(state, f"{net}_state")["sn_u"], sep="/")
        u_new = tu.flatten_dict(getattr(new_state, f"{net}_state")["sn_u"], sep="/")
        flat_p = tu.flatten_dict(params, sep="/")
        checked = 0
        for path, u0 in u_old.items():
            kpath = path[: -len("/u")] + "/kernel"
            w = flat_p.get(kpath)
            if w is None:
                continue
            # G up-block convs are transposed convs in deconv mode: SN runs
            # over the TF [H·W·out, in] layout (see SNConvTranspose2D)
            scope = path.split("/")
            is_deconv = (
                net == "g" and len(scope) >= 2 and scope[0].startswith("block_up_")
                and scope[1] in ("conv1", "conv2", "skip") and w.ndim == 4
            )
            w_mat = (
                w.transpose(0, 1, 3, 2).reshape(-1, w.shape[-2])
                if is_deconv
                else w.reshape(-1, w.shape[-1])
            )
            if w_mat.shape[-1] != u0.shape[0]:
                continue
            _, expected = power_iteration(w_mat, u0)
            np.testing.assert_allclose(
                np.asarray(u_new[path]), np.asarray(expected), atol=1e-5,
                err_msg=f"{net}/{path}: u advanced != exactly one iteration",
            )
            checked += 1
        assert checked > 0
