"""Pallas TPU kernel: k=3 stride-2 SAME transposed conv (the G upsampler).

Motivation (measured, benchmarks/conv_probe.py): XLA runs the flagship's
stride-2 deconvs at 25.8% of the zero-skipped MXU floor at 128^2 out
(up128 row) and 46% at 64^2 — the input-dilation lowering pays for the
zero lattice. An XLA-level polyphase re-write loses even harder (subpix
row: 9.7% — nine separate thin dots). This kernel keeps the polyphase
decomposition but fuses it: per row tile it builds the four phase patch
matrices in VMEM and runs four matmuls whose contracting dims are
exactly the zero-skipped tap counts (4C, 2C, 2C, C — 9C total, no
dilated zeros, no re-reads), then interleaves the phases in registers
and writes the (2T, 2W) output tile once.

Semantics: the reference upsampler is TF ``conv2d_transpose`` — the
*gradient* of conv — which for the layer's stored HWIO kernel reduces to
pure scatter: ``out[2i+ky, 2j+kx] += x[i,j] . w[ky,kx]`` (decoded
numerically in benchmarks/conv_probe.py against ``lax.conv_transpose``
with the TF flip applied; ``tests/test_kernels.py`` re-checks). Phase
(oy%2, ox%2) collects taps of matching parity:

    p00 = x[m,n].w00 + x[m,n-1].w02 + x[m-1,n].w20 + x[m-1,n-1].w22
    p01 = x[m,n].w01 + x[m-1,n].w21
    p10 = x[m,n].w10 + x[m,n-1].w12
    p11 = x[m,n].w11

Input streaming reuses the conv kernel's two-BlockSpec halo trick
(main tile + 2 extra rows of the H-padded input; only the leading row is
used here). Backward runs on XLA via ``jax.vjp`` of the reference
``lax.conv_transpose`` — the op is linear, so XLA DCEs the unused primal
and computes only dx/dw.

Used by :class:`biggan_tpu.ops.layers.SNConvTranspose2D` under the same
``conv_impl`` selector as the conv kernel. Reference op: ``deconv``
(ref ops.py:~78-110) — semantics unchanged.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from biggan_tpu.kernels.conv_pallas import _interpret, _pick_tile, _shift_w

# packed weight row order: taps for p00, p01, p10, p11
_PACK = ((0, 0), (0, 2), (2, 0), (2, 2), (0, 1), (2, 1), (1, 0), (1, 2),
         (1, 1))


def _kernel(main_ref, halo_ref, w_ref, b_ref, s_ref, o_ref, slab_ref):
    # main_ref: (1, T, W, C) rows [t*T, t*T+T) of the 1-row-lead-padded
    # input (so slab row r = x row t*T + r - 1); halo_ref: next 2 rows;
    # w_ref: (9C, Co) packed per _PACK; o_ref: (1, 2T, 2W, Co).
    _, tile, w, c = main_ref.shape
    co = o_ref.shape[-1]
    bias = b_ref[0].astype(jnp.float32)  # (Co,)

    slab_ref[0:tile] = main_ref[0]
    slab_ref[tile:tile + 2] = halo_ref[0]

    s_cur = slab_ref[1:tile + 1]   # x[m]
    s_up = slab_ref[0:tile]        # x[m-1]
    n = tile * w

    def mm(pieces, row0, rows):
        patch = (pieces[0] if len(pieces) == 1
                 else jnp.concatenate(pieces, axis=-1))
        acc = jax.lax.dot_general(
            patch.reshape(n, rows * c), w_ref[pl.ds(row0 * c, rows * c), :],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        return (acc + bias).astype(o_ref.dtype).reshape(tile, w, co)

    a = s_cur                    # x[m, n]
    b = _shift_w(s_cur, 0)       # x[m, n-1]
    cc = s_up                    # x[m-1, n]
    d = _shift_w(s_up, 0)        # x[m-1, n-1]

    p00 = mm([a, b, cc, d], 0, 4)
    p01 = mm([a, cc], 4, 2)
    p10 = mm([a, b], 6, 2)
    p11 = mm([a], 8, 1)

    # Interleave phases: out[2m+py, 2n+px] = p{py}{px}[m, n]. Mosaic
    # rejects both the stack+reshape and the repeat-based formulations
    # ("unsupported shape cast" on the inserted unit dim), so the column
    # interleave rides the MXU instead: s_ref holds the two 0/1
    # selection matrices S_px (2W x W) with S0[2n, n] = S1[2n+1, n] = 1,
    # and each output row is S0 @ p_even + S1 @ p_odd (+15% MXU work,
    # zero VPU shuffles). Rows interleave via static per-row stores —
    # pure address arithmetic on the untiled second-minor axis.
    s0 = s_ref[0]
    s1 = s_ref[1]

    def interleave(pl_, pr, m):  # rows m of two (tile, w, c) -> (2w, c)
        y = (jax.lax.dot_general(s0, pl_[m], (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
             + jax.lax.dot_general(s1, pr[m], (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32))
        return y.astype(o_ref.dtype)

    for m in range(tile):
        o_ref[0, 2 * m] = interleave(p00, p01, m)
        o_ref[0, 2 * m + 1] = interleave(p10, p11, m)


def _pack_weights(w, dtype):
    c, co = w.shape[2], w.shape[3]
    return jnp.concatenate([w[ky, kx] for ky, kx in _PACK],
                           axis=0).astype(dtype)  # (9C, Co)


def _deconv_call(xp, wp, bias, sel, *, tile):
    b, hp, w, c = xp.shape
    h = hp - 2
    co = wp.shape[-1]
    return pl.pallas_call(
        _kernel,
        grid=(b, h // tile),
        in_specs=[
            pl.BlockSpec((1, tile, w, c), lambda i, t: (i, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, w, c),
                         lambda i, t: (i, t * (tile // 2) + tile // 2, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(wp.shape, lambda i, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, co), lambda i, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(sel.shape, lambda i, t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 2 * tile, 2 * w, co),
                               lambda i, t: (i, t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 2 * h, 2 * w, co), xp.dtype),
        scratch_shapes=[pltpu.VMEM((tile + 2, w, c), xp.dtype)],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * w * 9 * c * co,
            bytes_accessed=2 * b * h * w * (c + 4 * co) + 2 * 9 * c * co,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(xp, xp, wp, bias, sel)


def _xla_ref(x, w):
    # the exact op SNConvTranspose2D emits (TF-grad semantics)
    return jax.lax.conv_transpose(
        x, w[::-1, ::-1], strides=(2, 2), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype)


def _run_local(x, w, bias, tile):
    b, h, w_sp, c = x.shape
    co = w.shape[-1]
    # lead-pad H by 1 (x[m-1] at m=0) plus one tail row for the halo spec
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0)))
    wp = _pack_weights(w, x.dtype)
    # 0/1 column-interleave selectors: S_px[2n+px, n] = 1
    eye = jnp.eye(w_sp, dtype=x.dtype)
    sel = jnp.zeros((2, 2 * w_sp, w_sp), x.dtype)
    sel = sel.at[0, 0::2, :].set(eye).at[1, 1::2, :].set(eye)
    return _deconv_call(xp, wp, bias.reshape(1, co).astype(x.dtype), sel,
                        tile=tile)


# Multi-chip: batch-dim partitioning rule (kernels/partition.py) — the
# batch grid axis shards along the data axis; weights/bias replicate.
@functools.lru_cache(maxsize=None)
def _run_partitioned(tile):
    from biggan_tpu.kernels.partition import batch_partitioned

    return batch_partitioned(
        lambda x, w, bias: _run_local(x, w, bias, tile),
        rule="b h w c, kh kw c co, co -> b hh ww co",
        replicated=("h", "w", "c", "kh", "kw", "co", "hh", "ww"),
        arg_batch_dims=(0, None, None),
        out_batch_dims=(0,),
    )


def _run(x, w, bias, tile):
    h, w_sp = x.shape[1], x.shape[2]
    t = tile or _pick_tile(h, w_sp)
    # same contract _pick_tile guarantees: the halo index map assumes an
    # even tile, and a non-divisor of H floors the grid (rows unwritten)
    if t % 2 != 0 or h % t != 0:
        raise ValueError(
            f"tile must be even and divide H: got tile={t}, H={h}")
    return _run_partitioned(t)(x, w, bias)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _deconv3x3s2(x, w, bias, tile):
    return _run(x, w, bias, tile)


def _deconv_fwd(x, w, bias, tile):
    return _run(x, w, bias, tile), (x, w)


def _deconv_bwd(tile, res, g):
    x, w = res
    # XLA autodiff of the linear reference op: the primal is DCE'd, only
    # the strided dx-conv and the dw correlation remain.
    _, vjp = jax.vjp(_xla_ref, x, w)
    dx, dw = vjp(g)
    db = jnp.sum(g.astype(jnp.float32), axis=(0, 1, 2)).astype(g.dtype)
    return dx, dw, db


_deconv3x3s2.defvjp(_deconv_fwd, _deconv_bwd)


def use_pallas_deconv(x_shape, kernel_size, strides) -> bool:
    """Should SNConvTranspose2D route through this kernel? Follows the
    shared ``conv_impl`` selector (set_conv_impl in conv_pallas): only
    when forced — the in-step A/B measured auto-routing a 7% regression
    (fused-epilogue forfeit; conv_pallas selector comment)."""
    from biggan_tpu.kernels.conv_pallas import get_conv_impl

    if get_conv_impl() != "pallas":
        return False
    return supported(x_shape, kernel_size, strides)


def supported(x_shape, kernel_size, strides) -> bool:
    """Gate: k=3 s=2 on the measured-win class (conv_probe r3d rows):
    32^2 x 384 (up64: 0.433 vs XLA 0.479 ms). The admitted band is wider
    than the evidence — 16^2 inputs and the 256/512 channel edges are
    EXTRAPOLATED from the 32^2 x 384 measurement, not probed (ADVICE r3);
    run a conv_probe row before relying on them. The 64^2 x 192 -> 128^2
    deconv LOSES here (0.978 vs 0.854 — the selection matmuls + patch
    build outweigh the polyphase gain at thin output channels), so XLA
    keeps it."""
    if len(x_shape) != 4:
        return False
    if tuple(kernel_size) != (3, 3) or tuple(strides) != (2, 2):
        return False
    _, h, w, c = x_shape
    return (16 <= h <= 32 and w >= 8 and h % 2 == 0 and w % 2 == 0
            and 256 <= c <= 512)


def deconv3x3s2(x: jax.Array, w: jax.Array, bias: jax.Array | None = None,
                tile: int | None = None) -> jax.Array:
    """k=3 stride-2 SAME transposed conv (TF-grad semantics), NHWC x
    HWIO -> NHWC with doubled spatial dims. Differentiable."""
    if bias is None:
        bias = jnp.zeros((w.shape[-1],), x.dtype)
    return _deconv3x3s2(x, w, bias, tile)
