"""Spectral normalization with explicit power-iteration state.

Reference behavior (ref ``ops.py:~403-430``): reshape the weight to
``[-1, C_out]``, keep a persistent non-trainable ``u ∈ [1, C_out]``, run one
power iteration per forward pass (``v = l2norm(u·Wᵀ)``, ``u' = l2norm(v·W)``,
``σ = v·W·u'ᵀ`` with stop-gradient on ``u``/``v``), divide ``W`` by σ, and
*mutate* ``u`` in place as a graph side effect.

Here the iteration is a pure function: ``(w, u) -> (w/σ, u', σ)``. Callers
(Flax modules in :mod:`biggan_tpu.ops.layers`) carry ``u`` in the ``sn_u``
variable collection and update it only when ``update=True`` (training), which
matches the reference's train-time-mutation / eval-time-freeze semantics.

Power iteration runs in float32 regardless of the compute dtype: it is a
normalization of the *parameter*, tiny compared to the conv/matmul it guards,
and bf16 norms drift. A Pallas fused kernel for the matvec pair lives in
:mod:`biggan_tpu.kernels.power_iter_pallas`; this XLA version is the always-
correct fallback (both are tested for parity in ``tests/test_sn.py``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-12

# Implementation selector for the power iteration: "auto" (fused Pallas
# kernel on TPU — measured 2.7× faster end-to-end on the train step —
# XLA elsewhere), "xla", or "pallas". Set once per model build from
# ``GANConfig.sn_impl``. Algorithm selection only, not numerics: both
# paths are parity-tested in tests/test_kernels.py.
_DEFAULT_IMPL = "auto"


def set_sn_impl(impl: str) -> None:
    global _DEFAULT_IMPL
    if impl not in ("auto", "xla", "pallas"):
        raise ValueError(f"sn_impl must be 'auto', 'xla' or 'pallas', got {impl!r}")
    _DEFAULT_IMPL = impl


def get_sn_impl() -> str:
    return _DEFAULT_IMPL


def _l2_normalize(x: jax.Array, eps: float = _EPS) -> jax.Array:
    return x * jax.lax.rsqrt(jnp.sum(jnp.square(x)) + eps)


def power_iteration(w_mat: jax.Array, u: jax.Array, n_iter: int = 1):
    """Run ``n_iter`` power-iteration steps on ``w_mat [in, out]``.

    Returns ``(sigma, u_new)`` where ``sigma`` is the estimated largest
    singular value. ``u`` has shape ``[out]``. All math in float32.
    """
    w32 = w_mat.astype(jnp.float32)
    u = u.astype(jnp.float32)

    # Reference iteration order (ref ops.py:~403-430): v from the *old* u,
    # u' from that v, and σ = vᵀ·W·u' — algebraically ‖Wᵀv‖. (Recomputing v
    # from u' would sneak in an extra half-iteration and disagree with both
    # the reference and the fused Pallas kernel.)
    def body(_, uv):
        u, _ = uv
        v = _l2_normalize(w32 @ u)  # [in]
        return _l2_normalize(v @ w32), v  # [out], [in]

    u_new, v = jax.lax.fori_loop(0, n_iter, body, (u, jnp.zeros(w32.shape[0]))) \
        if n_iter > 1 else body(0, (u, None))
    # σ with stop-gradient on the singular vectors: grads flow through W only.
    u_sg = jax.lax.stop_gradient(u_new)
    v_sg = jax.lax.stop_gradient(v)
    sigma = jnp.einsum("i,io,o->", v_sg, w32, u_sg)
    return sigma, jax.lax.stop_gradient(u_new)


@jax.custom_vjp
def _sigma_u_fused(w_mat: jax.Array, u: jax.Array):
    """Fused-kernel power iteration: ``(W[in,out], u) → (σ, u')``.

    Same stop-gradient contract as :func:`power_iteration`: ∂σ/∂W = v·u'ᵀ
    with the singular vectors held constant; ``u'`` is carried state and
    receives no gradient.
    """
    from biggan_tpu.kernels.power_iter_pallas import power_iteration_fused

    return power_iteration_fused(w_mat, u)


def _sigma_u_fused_fwd(w_mat, u):
    sigma, u_new = _sigma_u_fused(w_mat, u)
    return (sigma, u_new), (w_mat, u, u_new)


def _sigma_u_fused_bwd(res, cotangents):
    w_mat, u, u_new = res
    g_sigma, _ = cotangents  # u' is state; its cotangent is discarded
    w32 = w_mat.astype(jnp.float32)
    v = _l2_normalize(w32 @ u.astype(jnp.float32))  # one matvec, not a W-pass of matmuls
    dw = (g_sigma * jnp.outer(v, u_new)).astype(w_mat.dtype)
    return dw, jnp.zeros_like(u)


_sigma_u_fused.defvjp(_sigma_u_fused_fwd, _sigma_u_fused_bwd)


def sigma_metrics(params, sn_u, prefix: str = "") -> dict:
    """Estimated σ(W) for every spectrally-normalized kernel — the
    observability signal the reference exposes only implicitly through
    TensorBoard histograms (SURVEY §5). Pure function; call under jit.

    ``sn_u`` is the module's ``sn_u`` variable collection; its tree
    structure mirrors ``params`` with a ``u`` leaf next to each kernel.

    Deconv kernels are detected by ``u`` matching the kernel's C_in (the
    TF reshape convention — see SNConvTranspose2D); when C_in == C_out
    the layouts are indistinguishable here and the conv convention is
    used, which can report a slightly different σ for square deconv
    kernels. Observability-only: the training path always normalizes
    with the correct layout.
    """
    import flax.traverse_util as tu

    flat_p = tu.flatten_dict(params, sep="/")
    out = {}
    for path, u in tu.flatten_dict(sn_u, sep="/").items():
        scope = path[: -len("/u")] if path.endswith("/u") else ""
        kernel_path = f"{scope}/kernel" if scope else "kernel"
        w = flat_p.get(kernel_path)
        if w is None:
            continue
        if w.ndim == 4 and u.shape[0] == w.shape[2] and w.shape[2] != w.shape[3]:
            # deconv kernel: SN runs over the TF [H·W·out, in] matrix
            w = w.transpose(0, 1, 3, 2)
        sigma, _ = power_iteration(w.reshape(-1, w.shape[-1]), u)
        out[f"{prefix}sigma/{scope or 'kernel'}"] = sigma
    return out


def spectral_normalize(
    w: jax.Array,
    u: jax.Array,
    n_iter: int = 1,
    update: bool = True,
    impl: str | None = None,
):
    """Spectrally normalize an arbitrary-rank weight ``w``.

    ``w`` is reshaped to ``[-1, C_out]`` (last axis = output features, the
    reference's convention). Returns ``(w / σ, u_next)``; ``u_next == u``
    when ``update`` is False (eval mode uses the stored ``u`` without
    mutating it, ref ``BigGAN_128.py:~345`` test head).
    """
    w_mat = w.reshape(-1, w.shape[-1])
    impl = _DEFAULT_IMPL if impl is None else impl
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    if impl == "pallas" and n_iter == 1:
        from biggan_tpu.kernels import power_iter_pallas

        if power_iter_pallas.supports(w_mat.shape):
            sigma, u_new = _sigma_u_fused(w_mat, u)
        else:
            sigma, u_new = power_iteration(w_mat, u, n_iter=n_iter)
    else:
        sigma, u_new = power_iteration(w_mat, u, n_iter=n_iter)
    w_sn = (w.astype(jnp.float32) / sigma).astype(w.dtype)
    u_next = u_new if update else u
    return w_sn, u_next
