"""Isolated conv-formulation probe on the REAL device-trace meter.

NEXT.md item 4 (the one big untried v5e lever) says: before committing
to hand-written Pallas conv kernels, prototype ONE shape and trace it.
This probe goes one step earlier: it measures, in isolation, how fast
XLA's own conv emitter runs the flagship's hot conv shapes (BENCH_NOTES
"Round 3b" per-module attribution: dense convs 232 ms, deconv stack
206 ms of the 599 ms step) and compares alternative *mathematically
exact* formulations of the same op:

- ``xla``     — ``lax.conv_general_dilated`` NHWC bf16 (what
                ``ops/layers.py:SNConv2D`` emits today)
- ``taps``    — sum of k·k shifted matmuls (im2col without the 9x
                materialisation; gives XLA plain dots to tile)
- ``tapsT``   — the same, but in a (B, H, C, W) layout where the
                128-wide spatial W occupies the MXU lane dimension and
                the thin 96-channel axis sits in sublanes (upper bound
                for a "width-in-lanes" Pallas kernel; transpose cost
                excluded on purpose)
- ``xla_t``   — ``lax.conv_transpose`` (what SNConvTranspose2D emits)
- ``subpix``  — the stride-2 k=3 deconv decomposed into its four
                polyphase stride-1 convs (1x1, 1x2, 2x1, 2x2 taps) +
                pixel interleave: no input dilation, no zero-math.

Every alternative is parity-checked against the XLA reference op before
it is timed (``--check`` runs on CPU too). Timing uses the profiler
trace meter (utils/trace.py) — the only real single-chip clock here.

Usage:
  python benchmarks/conv_probe.py --check            # parity only (CPU ok)
  python benchmarks/conv_probe.py --shapes g128 --steps 3
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from biggan_tpu.utils.trace import load_device_steps

# Hot shapes of the BigGAN-128 ch=96 step at the probe batch (32; the
# headline batch 256 scales these linearly and B=32 already saturates
# the MXU pipeline for 128^2 spatial extents).
#   name: (B, H, W, Cin, Cout, stride)  stride 2 => transposed conv
SHAPES = {
    # G late stages (resblock_up convs) — the thin-channel MXU padders
    "g128": (32, 128, 128, 96, 96, 1),
    "g64": (32, 64, 64, 192, 192, 1),
    "g32": (32, 32, 32, 384, 384, 1),
    # G upsamplers (deconv stride 2: 2x spatial, channel halving)
    "up128": (32, 64, 64, 192, 96, 2),
    "up64": (32, 32, 32, 384, 192, 2),
    # D early stage (downsample direction is plain stride-1 conv + pool)
    "d128": (32, 128, 128, 96, 96, 1),
}


# ---------------------------------------------------------------- stride-1


def conv_xla(x, w):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype,
    )


def conv_taps(x, w):
    """3x3 SAME conv as nine shifted (BHW, Cin) @ (Cin, Cout) matmuls."""
    B, H, W, C = x.shape
    co = w.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    y = jnp.zeros((B, H, W, co), x.dtype)
    for dy in range(3):
        for dx in range(3):
            xs = jax.lax.slice(xp, (0, dy, dx, 0), (B, dy + H, dx + W, C))
            y = y + jnp.einsum(
                "bhwc,cd->bhwd", xs, w[dy, dx],
                preferred_element_type=jnp.float32,
            ).astype(x.dtype)
    return y


def conv_tapsT(xt, w):
    """The same nine taps, but contracted with spatial-W in MXU lanes.

    ``xt`` is (B, H, C, W): the 128-long spatial row fills the lane
    dimension exactly, and the thin channel axis (96/192) lands in
    sublanes where padding costs nothing. Each tap is
    (Cout, Cin) @ (Cin, W) batched over (B, H).
    """
    B, H, C, W = xt.shape
    co = w.shape[-1]
    xp = jnp.pad(xt, ((0, 0), (1, 1), (0, 0), (1, 1)))
    y = jnp.zeros((B, H, co, W), xt.dtype)
    for dy in range(3):
        for dx in range(3):
            xs = jax.lax.slice(xp, (0, dy, 0, dx), (B, dy + H, C, dx + W))
            # (co, ci) x (b, h, ci, w) -> (b, h, co, w)
            y = y + jnp.einsum(
                "dc,bhcw->bhdw", w[dy, dx].T, xs,
                preferred_element_type=jnp.float32,
            ).astype(xt.dtype)
    return y


# ---------------------------------------------------------------- stride-2 up


def deconv_xla(x, w):
    """Reference upsampler: TF-grad semantics (layers.py flips the kernel)."""
    return jax.lax.conv_transpose(
        x, w[::-1, ::-1], strides=(2, 2), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype,
    )


def deconv_subpix(x, w):
    """k=3 s=2 SAME deconv as four polyphase stride-1 convs + interleave.

    The reference upsampler (``deconv_xla``, TF-grad semantics with the
    kernel flip applied) obeys pure scatter semantics on the UNflipped w:
    ``out[2i+ky, 2j+kx] += x[i, j] · w[ky, kx]`` (verified numerically
    against ``lax.conv_transpose``). Output phase (oy%2, ox%2) therefore
    collects only taps with matching parity — 4+2+2+1 = 9 taps total,
    each a plain (BHW, Cin)x(Cin, Cout) matmul on the UNdilated input:
    no zero-padded dilation math ever reaches the MXU.
    """
    B, H, W, C = x.shape
    co = w.shape[-1]

    def tap(dy, dx, ky, kx):
        # x shifted by (dy, dx) ∈ {0, -1}: zero-pad at the start
        xs = x
        if dy or dx:
            xp = jnp.pad(x, ((0, 0), (max(dy, 0), 0), (max(dx, 0), 0), (0, 0)))
            xs = jax.lax.slice(xp, (0, 0, 0, 0), (B, H, W, C))
        return jnp.einsum("bhwc,cd->bhwd", xs, w[ky, kx],
                          preferred_element_type=jnp.float32).astype(x.dtype)

    # phase (oy%2, ox%2); ky ≡ oy, kx ≡ ox (mod 2); ky=2 reads x[i-1]
    p00 = tap(0, 0, 0, 0) + tap(0, 1, 0, 2) + tap(1, 0, 2, 0) + tap(1, 1, 2, 2)
    p01 = tap(0, 0, 0, 1) + tap(1, 0, 2, 1)
    p10 = tap(0, 0, 1, 0) + tap(0, 1, 1, 2)
    p11 = tap(0, 0, 1, 1)
    # interleave phases: out[2i+py, 2j+px]
    y = jnp.stack([jnp.stack([p00, p01], axis=3),
                   jnp.stack([p10, p11], axis=3)], axis=2)
    # (B, H, 2, W, 2, co) -> (B, 2H, 2W, co)
    return y.reshape(B, 2 * H, 2 * W, co)


def _pallas(variant, tile=None):
    from biggan_tpu.kernels.conv_pallas import conv3x3

    def run(x, w):
        return conv3x3(x, w, variant=variant, tile=tile)
    run.__name__ = f"conv_p_{variant}_t{tile or 'auto'}"
    return run


STRIDE1 = {
    "xla": conv_xla, "taps": conv_taps, "tapsT": conv_tapsT,
    "p_im2col": _pallas("im2col"), "p_im2col_pad": _pallas("im2col_pad"),
    "p_acc9": _pallas("acc9"),
    # tile sweep: grid-step overhead vs VMEM pressure
    "p_t4": _pallas("im2col", 4), "p_t16": _pallas("im2col", 16),
    "p_t32": _pallas("im2col", 32),
    # scratch-write patch build (no pad/concat temporaries)
    "p_s": _pallas("im2col_s"), "p_s_t16": _pallas("im2col_s", 16),
    "p_s_t32": _pallas("im2col_s", 32),
}
def _pallas_deconv(tile=None):
    from biggan_tpu.kernels.deconv_pallas import deconv3x3s2

    def run(x, w):
        return deconv3x3s2(x, w, tile=tile)
    run.__name__ = f"deconv_p_t{tile or 'auto'}"
    return run


STRIDE2 = {
    "xla_t": deconv_xla, "subpix": deconv_subpix,
    "p_phase": _pallas_deconv(), "p_phase_t8": _pallas_deconv(8),
    "p_phase_t32": _pallas_deconv(32),
}


def make_args(shape_key, dtype=jnp.bfloat16, seed=0):
    B, H, W, ci, co, stride = SHAPES[shape_key]
    kx, kw_ = jax.random.split(jax.random.PRNGKey(seed))
    x = jax.random.normal(kx, (B, H, W, ci), dtype)
    w = (jax.random.normal(kw_, (3, 3, ci, co), jnp.float32) * 0.05).astype(dtype)
    return x, w, stride


def check_parity(shape_key):
    """Max |delta| of every alternative vs its XLA reference op (f32)."""
    x, w, stride = make_args(shape_key, dtype=jnp.float32)
    out = {}
    if stride == 1:
        ref = conv_xla(x, w)
        out["taps"] = float(jnp.max(jnp.abs(conv_taps(x, w) - ref)))
        xt = jnp.transpose(x, (0, 1, 3, 2))
        yt = conv_tapsT(xt, w)
        out["tapsT"] = float(jnp.max(jnp.abs(
            jnp.transpose(yt, (0, 1, 3, 2)) - ref)))
    else:
        ref = deconv_xla(x, w)
        out["subpix"] = float(jnp.max(jnp.abs(deconv_subpix(x, w) - ref)))
    scale = float(jnp.max(jnp.abs(ref)))
    return {k: v / max(scale, 1e-6) for k, v in out.items()}


def conv_cost(shape_key):
    """(flops, min_bytes) of the exact op, zero-skipped for the deconv."""
    B, H, W, ci, co, stride = SHAPES[shape_key]
    flops = 2 * B * H * W * 9 * ci * co  # stride 2: 4H^2 outs x 9/4 taps = same
    bytes_ = 2 * (B * H * W * ci + 9 * ci * co
                  + B * H * W * co * (4 if stride == 2 else 1))
    return flops, bytes_


def time_variant(shape_key, vname, fn, steps, grad=False):
    x, w, stride = make_args(shape_key)
    if vname == "tapsT":
        x = jnp.transpose(x, (0, 1, 3, 2))

    if grad:
        def loss(x, w):
            return jnp.sum(fn(x, w).astype(jnp.float32) ** 2)
        run = jax.grad(loss, argnums=(0, 1))
    else:
        run = fn
    run = jax.jit(run)

    out = run(x, w)  # compile + warm outside the trace
    jax.block_until_ready(out)
    tdir = tempfile.mkdtemp(prefix=f"convprobe_{shape_key}_{vname}_")
    with jax.profiler.trace(tdir):
        for _ in range(steps):
            out = run(x, w)
        jax.block_until_ready(out)
    # the jit span is named after the wrapped callable
    spans, _ops = load_device_steps(tdir, step_prefix="jit_")
    if not spans:
        return {"error": "no device lane in trace"}
    durs = sorted(e["dur"] / 1e3 for e in spans)[:steps]
    best = min(durs)
    flops, bytes_ = conv_cost(shape_key)
    if grad:
        flops *= 3  # fwd + dL/dx + dL/dw
    peak_flops, peak_bw = 197e12, 819e9  # v5e; probe is relative anyway
    floor_ms = 1e3 * max(flops / peak_flops, bytes_ / peak_bw)
    return {
        "ms": round(best, 3),
        "all_ms": [round(d, 3) for d in durs],
        "pct_mxu": round(100 * (flops / peak_flops) / (best / 1e3), 1),
        "floor_ms": round(floor_ms, 3),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shapes", type=str, default=",".join(SHAPES))
    ap.add_argument("--variants", type=str, default="")
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--check", action="store_true", help="parity only")
    ap.add_argument("--grad", action="store_true", help="time fwd+bwd")
    args = ap.parse_args()

    for sk in args.shapes.split(","):
        stride = SHAPES[sk][5]
        if args.check:
            print(json.dumps({"shape": sk, "rel_err": check_parity(sk)}),
                  flush=True)
            continue
        table = STRIDE1 if stride == 1 else STRIDE2
        names = [v for v in (args.variants.split(",") if args.variants
                             else table) if v in table]
        for vname in names:
            try:
                r = time_variant(sk, vname, table[vname], args.steps,
                                 grad=args.grad)
            except Exception as e:  # noqa: BLE001 - probe must report, not die
                r = {"error": repr(e)[:200]}
            print(json.dumps({"shape": sk, "variant": vname,
                              "grad": args.grad, **r}), flush=True)


if __name__ == "__main__":
    main()
