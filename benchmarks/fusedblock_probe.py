"""Prototype probe: block-scale fused Pallas kernel for one G up-stage.

NEXT.md item 3 / VERDICT r4 item 1: the last single-chip perf idea with
real headroom is a kernel that carries the whole G-block stage —
cBN-apply → ReLU → stride-2 deconv → next-layer moment accumulation —
so the intermediate activation never round-trips HBM and no XLA epilogue
fusion is forfeited (the failure mode that killed the standalone Pallas
conv routing, BENCH_NOTES r3d).

This is a FORWARD-ONLY prototype probed in isolation, as the verdict
prescribes: if the fused chain does not clearly beat the XLA chain here,
the (large) custom-VJP investment is not made and the lever is recorded
as exhausted.

**VERDICT (r4, measured on the v5 lite device trace —
docs/bench/r4/fusedblock.jsonl): the lever is EXHAUSTED.** The fused
kernel loses ~2× to the XLA chain at BOTH flagship stages:
up64 384→192 fused 5.47 ms vs XLA 3.35 (0.61×); up128 192→96 fused
11.08 vs 5.66 (0.51×). XLA already fuses the cBN-apply+ReLU prologue
into the deconv read and the moment epilogue into its write, and its
deconv emitter beats the polyphase kernel once that fusion parity is
reached — the same conclusion as the r3d standalone-conv routing, now
established for the full fused chain as well. No custom VJP is built;
the kernel below stays as the archived experiment.

The kernel extends ``deconv_pallas._kernel``:

- prologue: slab rows are transformed ``relu((x−μ)·rsqrt(σ²+ε)·γ_b+β_b)``
  at store time (γ/β are per-sample rows — cBN); the H-pad rows that
  must stay zero *after* the transform are re-zeroed by grid position.
- epilogue: per-channel Σy and Σy² accumulate in f32 across the whole
  grid into two revisited (1, Co) outputs (the next cBN's moments).

Usage:
  python benchmarks/fusedblock_probe.py --check        # CPU parity
  python benchmarks/fusedblock_probe.py --steps 3      # silicon trace
"""

from __future__ import annotations

import argparse

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from biggan_tpu.kernels.conv_pallas import _interpret, _pick_tile, _shift_w  # noqa: E402
from biggan_tpu.kernels.deconv_pallas import _pack_weights, _xla_ref  # noqa: E402
from biggan_tpu.utils.trace import load_device_steps  # noqa: E402

EPS = 1e-5


def _fused_kernel(main_ref, halo_ref, scale_ref, shift_ref, w_ref, b_ref,
                  s_ref, o_ref, sum_ref, sq_ref, slab_ref):
    # main/halo/w/b/s as in deconv_pallas._kernel; scale/shift: (1, C)
    # per-sample rows of γ·rsqrt(σ²+ε) and β−μ·γ·rsqrt(σ²+ε) (folded cBN);
    # sum/sq: (1, Co) f32 accumulators revisited across the whole grid.
    t = pl.program_id(1)
    nt = pl.num_programs(1)
    _, tile, w, c = main_ref.shape
    co = o_ref.shape[-1]
    bias = b_ref[0].astype(jnp.float32)
    scale = scale_ref[0, 0].astype(jnp.float32)
    shift = shift_ref[0, 0].astype(jnp.float32)

    def xform(rows):
        return jnp.maximum(
            rows.astype(jnp.float32) * scale + shift, 0.0
        ).astype(rows.dtype)

    slab_ref[0:tile] = xform(main_ref[0])
    slab_ref[tile:tile + 2] = xform(halo_ref[0])

    # H-pad rows must be zero AFTER the transform (deconv pads the
    # *transformed* activation): slab row 0 at t=0 is the lead pad, slab
    # row tile+1 at the last tile is the tail pad.
    @pl.when(t == 0)
    def _():
        slab_ref[0] = jnp.zeros_like(slab_ref[0])

    @pl.when(t == nt - 1)
    def _():
        slab_ref[tile + 1] = jnp.zeros_like(slab_ref[tile + 1])

    s_cur = slab_ref[1:tile + 1]
    s_up = slab_ref[0:tile]
    n = tile * w

    def mm(pieces, row0, rows):
        patch = (pieces[0] if len(pieces) == 1
                 else jnp.concatenate(pieces, axis=-1))
        acc = jax.lax.dot_general(
            patch.reshape(n, rows * c), w_ref[pl.ds(row0 * c, rows * c), :],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        return acc + bias  # f32 (tile*w, co)

    a = s_cur
    b = _shift_w(s_cur, 0)
    cc = s_up
    d = _shift_w(s_up, 0)

    p00 = mm([a, b, cc, d], 0, 4)
    p01 = mm([a, cc], 4, 2)
    p10 = mm([a, b], 6, 2)
    p11 = mm([a], 8, 1)

    # epilogue: next-layer moments in f32 from the phase tensors (before
    # the bf16 interleave) — Σy and Σy² per channel across the grid
    psum = (jnp.sum(p00, axis=0) + jnp.sum(p01, axis=0)
            + jnp.sum(p10, axis=0) + jnp.sum(p11, axis=0)).reshape(1, co)
    psq = (jnp.sum(p00 * p00, axis=0) + jnp.sum(p01 * p01, axis=0)
           + jnp.sum(p10 * p10, axis=0) + jnp.sum(p11 * p11, axis=0)
           ).reshape(1, co)

    first = jnp.logical_and(pl.program_id(0) == 0, t == 0)

    @pl.when(first)
    def _():
        sum_ref[:] = psum
        sq_ref[:] = psq

    @pl.when(jnp.logical_not(first))
    def _():
        sum_ref[:] += psum
        sq_ref[:] += psq

    s0 = s_ref[0]
    s1 = s_ref[1]
    p00c, p01c, p10c, p11c = (
        x.astype(o_ref.dtype).reshape(tile, w, co) for x in (p00, p01, p10, p11)
    )

    def interleave(pl_, pr, m):
        y = (jax.lax.dot_general(s0, pl_[m], (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
             + jax.lax.dot_general(s1, pr[m], (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32))
        return y.astype(o_ref.dtype)

    for m in range(tile):
        o_ref[0, 2 * m] = interleave(p00c, p01c, m)
        o_ref[0, 2 * m + 1] = interleave(p10c, p11c, m)


def fused_block(x, mean, var, gamma, beta, w, bias, tile=None):
    """cBN-apply → ReLU → deconv3x3s2 → (y, Σy, Σy²).

    x: [B,H,W,C]; mean/var: [C] batch stats; gamma/beta: [B,C] per-sample
    (cBN); w: [3,3,C,Co]; bias: [Co]. Returns y [B,2H,2W,Co] and the
    per-channel f32 sums the next cBN needs.
    """
    b, h, w_sp, c = x.shape
    co = w.shape[-1]
    inv = jax.lax.rsqrt(var.astype(jnp.float32) + EPS)
    scale = (gamma.astype(jnp.float32) * inv).astype(x.dtype)  # [B, C]
    shift = (beta.astype(jnp.float32)
             - gamma.astype(jnp.float32) * mean.astype(jnp.float32) * inv
             ).astype(x.dtype)
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0)))
    wp = _pack_weights(w, x.dtype)
    t = tile or _pick_tile(h, w_sp)
    eye = jnp.eye(w_sp, dtype=x.dtype)
    sel = jnp.zeros((2, 2 * w_sp, w_sp), x.dtype)
    sel = sel.at[0, 0::2, :].set(eye).at[1, 1::2, :].set(eye)

    y, ysum, ysq = pl.pallas_call(
        _fused_kernel,
        grid=(b, h // t),
        in_specs=[
            pl.BlockSpec((1, t, w_sp, c), lambda i, tt: (i, tt, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, w_sp, c),
                         lambda i, tt: (i, tt * (t // 2) + t // 2, 0, 0),
                         memory_space=pltpu.VMEM),
            # [B, 1, C] with a (1, 1, C) block: the trailing two block dims
            # equal the array dims, satisfying Mosaic's (8, 128) rule for
            # per-sample rows (a (1, C) block over [B, C] is rejected)
            pl.BlockSpec((1, 1, c), lambda i, tt: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda i, tt: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(wp.shape, lambda i, tt: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, co), lambda i, tt: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(sel.shape, lambda i, tt: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 2 * t, 2 * w_sp, co), lambda i, tt: (i, tt, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, co), lambda i, tt: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, co), lambda i, tt: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, 2 * h, 2 * w_sp, co), x.dtype),
            jax.ShapeDtypeStruct((1, co), jnp.float32),
            jax.ShapeDtypeStruct((1, co), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((t + 2, w_sp, c), x.dtype)],
        interpret=_interpret(),
    )(xp, xp, scale[:, None, :], shift[:, None, :], wp,
      bias.reshape(1, co).astype(x.dtype), sel)
    return y, ysum[0], ysq[0]


def xla_chain(x, mean, var, gamma, beta, w, bias):
    inv = jax.lax.rsqrt(var.astype(jnp.float32) + EPS)
    xt = jax.nn.relu(
        (x.astype(jnp.float32) - mean) * inv * gamma[:, None, None, :]
        + beta[:, None, None, :]
    ).astype(x.dtype)
    y = _xla_ref(xt, w) + bias.astype(x.dtype)
    yf = y.astype(jnp.float32)
    return y, jnp.sum(yf, axis=(0, 1, 2)), jnp.sum(yf * yf, axis=(0, 1, 2))


SHAPES = {
    # G up4 at the flagship: 32²×384 → 64²×192 (the deconv kernel's
    # measured-win class) and up5: 64²×192 → 128²×96 (XLA's class)
    "up64_384_192": (256, 32, 384, 192),
    "up128_192_96": (256, 64, 192, 96),
}


def make_inputs(name, dtype):
    import numpy as np

    b, h, c, co = SHAPES[name]
    rng = np.random.RandomState(0)
    return (
        jnp.asarray(rng.randn(b, h, h, c), dtype),
        jnp.asarray(rng.rand(c), jnp.float32),
        jnp.asarray(rng.rand(c) + 0.5, jnp.float32),
        jnp.asarray(1.0 + 0.1 * rng.randn(b, c), jnp.float32),
        jnp.asarray(0.1 * rng.randn(b, c), jnp.float32),
        jnp.asarray(rng.randn(3, 3, c, co) * 0.05, dtype),
        jnp.asarray(rng.randn(co) * 0.1, dtype),
    )


def check():
    import numpy as np

    jax.config.update("jax_platforms", "cpu")
    b, h, c, co = 4, 8, 16, 8
    rng = np.random.RandomState(0)
    args = (
        jnp.asarray(rng.randn(b, h, h, c), jnp.float32),
        jnp.asarray(rng.rand(c), jnp.float32),
        jnp.asarray(rng.rand(c) + 0.5, jnp.float32),
        jnp.asarray(1.0 + 0.1 * rng.randn(b, c), jnp.float32),
        jnp.asarray(0.1 * rng.randn(b, c), jnp.float32),
        jnp.asarray(rng.randn(3, 3, c, co) * 0.05, jnp.float32),
        jnp.asarray(rng.randn(co) * 0.1, jnp.float32),
    )
    y, s, q = fused_block(*args, tile=4)
    yr, sr, qr = xla_chain(*args)
    np.testing.assert_allclose(np.asarray(y), np.asarray(yr), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(s), np.asarray(sr), rtol=2e-4, atol=2e-3)
    np.testing.assert_allclose(np.asarray(q), np.asarray(qr), rtol=2e-4, atol=2e-3)
    print("parity OK")


def probe(name, steps):
    args = make_inputs(name, jnp.bfloat16)
    out = {"shape": name}
    for tag, fn in (("fused", fused_block), ("xla", xla_chain)):
        f = lambda *a, _fn=fn: _fn(*a)  # noqa: E731
        f.__name__ = f"fblock_{tag}"
        jf = jax.jit(f)
        r = jf(*args)
        jax.block_until_ready(r)
        tdir = tempfile.mkdtemp(prefix=f"fblock_{tag}_")
        with jax.profiler.trace(tdir):
            for _ in range(steps):
                r = jf(*args)
            jax.block_until_ready(r)
        spans, _ = load_device_steps(tdir, step_prefix=f"jit_fblock_{tag}")
        out[f"{tag}_ms"] = (round(min(e["dur"] for e in spans) / 1e3, 3)
                            if spans else None)
    if out.get("fused_ms") and out.get("xla_ms"):
        out["speedup"] = round(out["xla_ms"] / out["fused_ms"], 3)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true")
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--shapes", type=str, default="up64_384_192,up128_192_96")
    args = ap.parse_args()
    if args.check:
        check()
        return
    for name in args.shapes.split(","):
        try:
            print(json.dumps(probe(name, args.steps)), flush=True)
        except Exception as e:
            print(json.dumps({"shape": name, "error": repr(e)[:200]}), flush=True)


if __name__ == "__main__":
    main()
