"""Isolated silicon A/B of the flash-attention kernel variants.

The r3 per-module attribution put attention at ~151 ms of the 599 ms
flagship step, with the D-attention backward alone at 73.8 ms — the
largest single op-level target the trace meter exposed (VERDICT r3 weak
#7). This probe times the attention kernel IN ISOLATION on the device
trace at the two flagship shape classes (G: 64²·C192, D: 64²·C96), for
each (variant, block_n): forward-only and forward+backward programs.

The kernel's matmuls are thin (d = C/8 ≤ 24), so it is VPU-bound on the
[block_n, m] score tile; variant "v2" folds the softmax normalization
out of that tile (see kernels/attention_pallas.py). Isolation wins here
must still be confirmed in the full step (trace_probe.py) — r3's lesson
is that custom-call boundaries can forfeit XLA epilogue fusions worth
more than the kernel win.

Usage: python benchmarks/attn_probe.py [--steps 3] [--blocks 256,512,1024]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from biggan_tpu.utils.trace import load_device_steps  # noqa: E402

# (batch, n, d, m, dv) — the flagship BigGAN-128 attention placements
# (attn at 64²; G: C=2ch=192 → d=24, dv=96; D: C=ch=96 → d=12, dv=48;
# pooled k/v → m = n/4)
SHAPES = {
    "g64_c192": (256, 4096, 24, 1024, 96),
    "d64_c96": (256, 4096, 12, 1024, 48),
    # The long-context claim (ops/attn.py / SURVEY §5): attention moved to
    # 128² → N=16384, pooled M=4096, C=96 (G's last-stage width). Batch 16
    # (not 256) keeps the probe program inside the compile relay's limits;
    # per-token cost is batch-independent (grid is (b, n/block)). The
    # picker's VMEM math admits exactly block 256 here (score tile
    # 256×4096×4B = 4 MB).
    "attn128_c96": (16, 16384, 12, 4096, 48),
}


def probe_one(shape_name, variant, block_n, steps):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from biggan_tpu.kernels.attention_pallas import (
        _pick_block_n, flash_attention, set_attn_tuning,
    )

    b, n, d, m, dv = SHAPES[shape_name]
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(b, n, d), jnp.bfloat16)
    k = jnp.asarray(rng.randn(b, m, d), jnp.bfloat16)
    v = jnp.asarray(rng.randn(b, m, dv), jnp.bfloat16)

    # "v2b" = v2 with the bf16 score-tile deviation
    score_dtype = "bfloat16" if variant == "v2b" else "float32"
    prev = set_attn_tuning(
        block_n=block_n, variant="v2" if variant == "v2b" else variant,
        score_dtype=score_dtype)
    try:
        # A block that doesn't tile this shape makes flash_attention fall
        # back to XLA — refuse to emit a row that would label an XLA
        # timing as a (variant, block) kernel measurement.
        if _pick_block_n(n, m) == 0:
            return {"shape": shape_name, "variant": variant,
                    "block_n": block_n,
                    "error": f"block {block_n} does not tile n={n}, m={m} "
                             "(kernel would fall back to XLA)"}
        def attn_fwd(q, k, v):
            return flash_attention(q, k, v)

        def attn_fwdbwd(q, k, v):
            def loss(q, k, v):
                return jnp.sum(flash_attention(q, k, v).astype(jnp.float32))

            return jax.grad(loss, argnums=(0, 1, 2))(q, k, v)

        out = {"shape": shape_name, "variant": variant, "block_n": block_n}
        for tag, fn in (("fwd", attn_fwd), ("fwdbwd", attn_fwdbwd)):
            fn.__name__ = f"attnprobe_{tag}"
            jf = jax.jit(fn)
            r = jf(q, k, v)  # compile + warm
            jax.block_until_ready(r)
            tdir = tempfile.mkdtemp(prefix=f"attn_{tag}_")
            with jax.profiler.trace(tdir):
                for _ in range(steps):
                    r = jf(q, k, v)
                jax.block_until_ready(r)
            spans, _ = load_device_steps(tdir, step_prefix=f"jit_attnprobe_{tag}")
            if spans:
                out[f"{tag}_ms"] = round(min(e["dur"] for e in spans) / 1e3, 3)
            else:
                out[f"{tag}_ms"] = None
                out["error"] = "no device lane"
        if out.get("fwd_ms") and out.get("fwdbwd_ms"):
            out["bwd_ms"] = round(out["fwdbwd_ms"] - out["fwd_ms"], 3)
        return out
    finally:
        set_attn_tuning(*prev)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--blocks", type=str, default="256,512,1024")
    ap.add_argument("--variants", type=str, default="v1,v2")
    ap.add_argument("--shapes", type=str, default="g64_c192,d64_c96")
    args = ap.parse_args()

    for shape in args.shapes.split(","):
        for variant in args.variants.split(","):
            for bn in (int(x) for x in args.blocks.split(",")):
                try:
                    print(json.dumps(probe_one(shape, variant, bn, args.steps)),
                          flush=True)
                except Exception as e:
                    print(json.dumps({
                        "shape": shape, "variant": variant, "block_n": bn,
                        "error": repr(e)[:200],
                    }), flush=True)


if __name__ == "__main__":
    main()
