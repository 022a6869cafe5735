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


def _l2_normalize(x: jax.Array, eps: float = _EPS) -> jax.Array:
    return x * jax.lax.rsqrt(jnp.sum(jnp.square(x)) + eps)


def power_iteration(w_mat: jax.Array, u: jax.Array, n_iter: int = 1):
    """Run ``n_iter`` power-iteration steps on ``w_mat [in, out]``.

    Returns ``(sigma, u_new)`` where ``sigma`` is the estimated largest
    singular value. ``u`` has shape ``[out]``. All math in float32.
    """
    w32 = w_mat.astype(jnp.float32)
    u = u.astype(jnp.float32)

    def body(_, u):
        v = _l2_normalize(w32 @ u)  # [in]
        u = _l2_normalize(v @ w32)  # [out]
        return u

    u_new = jax.lax.fori_loop(0, n_iter, body, u) if n_iter > 1 else body(0, u)
    v = _l2_normalize(w32 @ u_new)
    # σ = vᵀ W u with stop-gradient on the singular vectors (ref semantics):
    # grads flow through W only.
    u_sg = jax.lax.stop_gradient(u_new)
    v_sg = jax.lax.stop_gradient(v)
    sigma = jnp.einsum("i,io,o->", v_sg, w32, u_sg)
    return sigma, jax.lax.stop_gradient(u_new)


def spectral_normalize(
    w: jax.Array,
    u: jax.Array,
    n_iter: int = 1,
    update: bool = True,
):
    """Spectrally normalize an arbitrary-rank weight ``w``.

    ``w`` is reshaped to ``[-1, C_out]`` (last axis = output features, the
    reference's convention). Returns ``(w / σ, u_next)``; ``u_next == u``
    when ``update`` is False (eval mode uses the stored ``u`` without
    mutating it, ref ``BigGAN_128.py:~345`` test head).
    """
    w_mat = w.reshape(-1, w.shape[-1])
    sigma, u_new = power_iteration(w_mat, u, n_iter=n_iter)
    w_sn = (w.astype(jnp.float32) / sigma).astype(w.dtype)
    u_next = u_new if update else u
    return w_sn, u_next
