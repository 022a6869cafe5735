"""Pallas TPU kernel: blockwise SAGAN attention (flash-style softmax).

Replaces the XLA path of :class:`biggan_tpu.ops.attn.SelfAttention`
(ref ``ops.py:~250-310`` — ``self_attention``/``self_attention_2``). The
XLA path materializes the ``[B, N, M]`` score matrix in HBM (N = H·W up
to 16384, M = N or N/4); this kernel tiles the query axis, keeps the
pooled keys/values fully VMEM-resident (M ≤ 4096 at every supported
resolution, SURVEY §5 "long-context"), and never writes scores to HBM:

    per (batch b, q-block i):
        s = q_i · kᵀ            (f32 on the MXU, no 1/√d scaling — SAGAN)
        p = softmax(s)          (row-wise, M fully resident → exact, no
                                 online renormalization needed)
        o_i = p · v

The backward pass is also Pallas (scores recomputed per q-block, dk/dv
accumulated in the revisited output block across the q-block grid axis),
wired through ``jax.custom_vjp`` so the kernel trains.

On non-TPU backends (the CPU test mesh) the kernels run in interpreter
mode; parity vs the XLA path is covered by ``tests/test_kernels.py``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _pick_block_n(n: int, m: int) -> int:
    # keep the per-block f32 score tile (block_n × m) ≲ 4 MB of VMEM
    for bn in (512, 256, 128, 64, 32, 16, 8):
        if n % bn == 0 and bn * m * 4 <= 4 * 1024 * 1024:
            return bn
    return 0  # no valid tiling → caller falls back to XLA


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref):
    # matmuls take the input dtype (bf16 on TPU) with f32 accumulation —
    # casting inputs up would halve MXU throughput for no accuracy gain.
    s = jax.lax.dot_general(
        q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [bn, m] f32
    s = s - jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    o = jnp.dot(
        p.astype(v_ref.dtype), v_ref[0], preferred_element_type=jnp.float32
    )
    o_ref[0] = o.astype(o_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref):
    i = pl.program_id(1)

    q, k, v, do = q_ref[0], k_ref[0], v_ref[0], do_ref[0]
    in_dt = q.dtype

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    s = s - jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s)
    p = p / jnp.sum(p, axis=-1, keepdims=True)  # [bn, m] f32

    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [bn, m]
    delta = jnp.sum(p * dp, axis=-1, keepdims=True)
    ds = (p * (dp - delta)).astype(in_dt)  # [bn, m]

    dq_ref[0] = jnp.dot(ds, k, preferred_element_type=jnp.float32).astype(dq_ref.dtype)

    # dk/dv output blocks are revisited for every q-block of the same batch
    # (index map ignores i), so accumulate across the minor grid axis and
    # let Pallas flush when the batch index changes.
    dk_i = jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # [m, d]
    dv_i = jax.lax.dot_general(
        p.astype(in_dt), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [m, dv]

    @pl.when(i == 0)
    def _():
        dk_ref[0] = dk_i
        dv_ref[0] = dv_i

    @pl.when(i > 0)
    def _():
        dk_ref[0] += dk_i
        dv_ref[0] += dv_i


def _fwd_call(q, k, v, block_n):
    b, n, d = q.shape
    m, dv = k.shape[1], v.shape[2]
    grid = (b, n // block_n)
    return pl.pallas_call(
        _fwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_n, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, dv), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, block_n, dv), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, n, dv), v.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * m * (d + dv),
            bytes_accessed=4 * b * (n * d + m * d + m * dv + n * dv),
            transcendentals=b * n * m,
        ),
        interpret=_interpret(),
    )(q, k, v)


def _bwd_call(q, k, v, do, block_n):
    b, n, d = q.shape
    m, dv = k.shape[1], v.shape[2]
    grid = (b, n // block_n)
    dq, dk, dv_ = pl.pallas_call(
        _bwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_n, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, dv), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n, dv), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, block_n, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, dv), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n, d), q.dtype),
            jax.ShapeDtypeStruct((b, m, d), jnp.float32),
            jax.ShapeDtypeStruct((b, m, dv), jnp.float32),
        ],
        interpret=_interpret(),
    )(q, k, v, do)
    return dq, dk.astype(k.dtype), dv_.astype(v.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _flash_attention(q, k, v, block_n):
    return _fwd_call(q, k, v, block_n)


def _flash_fwd(q, k, v, block_n):
    return _fwd_call(q, k, v, block_n), (q, k, v)


def _flash_bwd(block_n, res, g):
    q, k, v = res
    return _bwd_call(q, k, v, g, block_n)


_flash_attention.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(q: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
    """``softmax(q·kᵀ)·v`` (unscaled, SAGAN semantics) without materializing
    the score matrix in HBM. ``q: [B, N, d]``, ``k: [B, M, d]``,
    ``v: [B, M, dv]`` → ``[B, N, dv]``.

    Falls back to the XLA einsum path when no VMEM-safe tiling of N
    exists (tiny or prime N — test-sized inputs).
    """
    n, m = q.shape[1], k.shape[1]
    block_n = _pick_block_n(n, m)
    if block_n == 0:
        from biggan_tpu.ops.attn import attention_xla

        return attention_xla(q, k, v)
    return _flash_attention(q, k, v, block_n)
