"""Pallas TPU kernel: fused spectral-norm power iteration.

One power-iteration step for :mod:`biggan_tpu.ops.sn` (ref
``ops.py:~403-430``) reads the weight matrix from HBM **once** instead of
the XLA path's three passes (``W·u``, ``v·W``, ``v·W·u``). Algebra:

    h = W·u                    (length in,  per row-block)
    v = h / ‖h‖
    t = Wᵀ·v = (Σᵢ Wᵢᵀ·hᵢ) / ‖h‖
    σ = ‖t‖          u' = t / σ

``hᵢ`` depends only on the row-block ``Wᵢ``, so ``Σ Wᵢᵀ hᵢ`` and ``‖h‖²``
accumulate in the same single sweep over row blocks; the scalar
normalizations happen on the final block. The kernel emits ``(σ, u')``;
``v`` is not needed by the caller — the custom VJP in
:func:`biggan_tpu.ops.sn.power_iteration` treats the singular vectors as
stop-gradients (ref semantics), so ∂σ/∂W = v·u'ᵀ is reconstructed from
``σ·W`` algebra on the XLA side.

Weights with more than ``MAX_OUT`` output features (the generator's
z→4·4·16ch dense layer) fall back to the XLA path — their row blocks
would not fit VMEM with a lane-aligned ``out`` axis.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MAX_OUT = 2048  # largest conv C_out is 16·ch = 1536 (BigGAN-512, ch=96)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _kernel(w_ref, u_ref, sigma_ref, u_out_ref, t_acc, h2_acc):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        t_acc[:] = jnp.zeros_like(t_acc)
        h2_acc[0, 0] = 0.0

    w = w_ref[:].astype(jnp.float32)  # [block_rows, out]
    u = u_ref[:].astype(jnp.float32)  # [1, out]
    h = jax.lax.dot_general(  # W_i · u : [block_rows, 1]
        w, u, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    t_acc[:] += jax.lax.dot_general(  # W_iᵀ · h : [1, out]
        h, w, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    h2_acc[0, 0] += jnp.sum(h * h)

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        eps = 1e-12
        h_norm = jnp.sqrt(h2_acc[0, 0] + eps)
        t = t_acc[:] / h_norm  # = Wᵀ v
        sigma = jnp.sqrt(jnp.sum(t * t) + eps)  # ‖Wᵀv‖ = vᵀWu'
        sigma_ref[0, 0] = sigma
        u_out_ref[:] = (t / sigma).astype(u_out_ref.dtype)


_VMEM_BUDGET = 8 * 1024 * 1024


def _pick_block_rows(n_in: int, n_out: int) -> int:
    """Row-block size satisfying the Mosaic constraint: a block's last two
    dims must be divisible by (8, 128) or equal the full array dims.
    Returns 0 when no legal tiling exists (caller falls back to XLA)."""
    if n_in * n_out * 4 <= _VMEM_BUDGET:
        return n_in  # whole array in one block — always legal
    for br in (1024, 512, 256, 128, 64, 32, 16, 8):  # all divisible by 8
        if n_in % br == 0 and br * n_out * 4 <= _VMEM_BUDGET:
            return br
    return 0


def _power_iter_local(w_mat: jax.Array, u2: jax.Array):
    n_in, n_out = w_mat.shape
    block_rows = _pick_block_rows(n_in, n_out)
    return pl.pallas_call(
        _kernel,
        grid=(n_in // block_rows,),
        in_specs=[
            pl.BlockSpec((block_rows, n_out), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_out), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, n_out), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
            jax.ShapeDtypeStruct((1, n_out), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, n_out), jnp.float32),
            pltpu.SMEM((1, 1), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * n_in * n_out,
            bytes_accessed=4 * (n_in * n_out + 2 * n_out),
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(w_mat, u2)


# Multi-chip: unlike the activation kernels there is no batch axis here —
# W is replicated under data parallelism, so the correct SPMD rule is
# "replicate everything" (each chip runs the same single-sweep kernel on
# its weight replica; under tensor parallelism the partitioner inserts
# the W all-gather this rule demands). Registering it explicitly closes
# the no-GSPMD-rule hole for Mosaic custom calls (kernels/partition.py).
@functools.lru_cache(maxsize=None)
def _get_power_iter_partitioned():
    from biggan_tpu.kernels.partition import batch_partitioned

    return batch_partitioned(
        _power_iter_local,
        rule="i o, a o -> c d, e o",
        replicated=("i", "o", "a", "c", "d", "e"),
        arg_batch_dims=(None, None),
        out_batch_dims=(None, None),
    )


@functools.partial(jax.jit, static_argnames=())
def _power_iter_call(w_mat: jax.Array, u: jax.Array):
    n_out = w_mat.shape[1]
    sigma, u_new = _get_power_iter_partitioned()(w_mat, u.reshape(1, n_out))
    return sigma[0, 0], u_new.reshape(n_out)


def supports(w_mat_shape) -> bool:
    """Whether the fused kernel handles this ``[in, out]`` shape."""
    n_in, n_out = w_mat_shape
    return n_out <= MAX_OUT and n_in >= 1 and _pick_block_rows(n_in, n_out) > 0


def power_iteration_fused(w_mat: jax.Array, u: jax.Array):
    """One fused power-iteration step: ``(W[in,out], u[out]) → (σ, u')``.

    Single HBM sweep over W. Caller is responsible for the stop-gradient
    semantics (see :func:`biggan_tpu.ops.sn.power_iteration`).
    """
    if not supports(w_mat.shape):
        raise ValueError(f"shape {w_mat.shape} unsupported; use the XLA path")
    return _power_iter_call(w_mat, u)
