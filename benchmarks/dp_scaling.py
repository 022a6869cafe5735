"""Data-parallel weak-scaling curve over an n-device mesh.

NEXT.md's first multi-chip task: when real multi-chip hardware is
available, quantify (a) DP scaling of the full fused train step at fixed
per-chip batch and (b) what the Pallas kernels' ``custom_partitioning``
rules buy vs the XLA-attention path (the wrappers exist to prevent GSPMD's
replicate-operands fallback — kernels/partition.py).

One JSON row per (n_devices, impl): wall seconds/step (median of
``--iters`` timed steps after warmup), derived img/s, and scaling
efficiency vs the 1-device row of the same impl. On a real TPU mesh the
wall clock is meaningful; on the virtual CPU mesh (default here, via
tests-style forcing) the rows only validate that the harness and both
impl paths execute — CPU interpret-mode Pallas timings are NOT silicon
evidence, and the row is labeled ``"wall_clock_meaningful": false``.

Usage:
    python benchmarks/dp_scaling.py [--devices 1,2,4,8] [--impls pallas,xla]
        [--per-chip-batch 8] [--iters 3] [--ch 16] [--img-size 64]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def run_one(n_dev: int, impl: str, args) -> dict:
    import jax
    import numpy as np
    from jax.sharding import Mesh

    from biggan_tpu.configs import get_config
    from biggan_tpu.parallel.sharding import batch_sharding, replicate
    from biggan_tpu.training.train_state import create_train_state
    from biggan_tpu.training.train_step import make_train_step

    devs = jax.devices()[:n_dev]
    if len(devs) < n_dev:
        return {"n_devices": n_dev, "impl": impl,
                "error": f"only {len(devs)} devices available"}
    mesh = Mesh(np.array(devs).reshape(n_dev, 1), ("data", "model"))

    batch_size = args.per_chip_batch * n_dev
    cfg = get_config(
        "biggan64_imagenet" if args.img_size == 64 else "biggan128_paper",
        img_size=args.img_size, ch=args.ch, batch_size=batch_size,
        num_classes=16, n_critic=1, grad_accum=1, dataset="synthetic",
        attn_impl=impl, sn_impl=impl,
        compute_dtype=("bfloat16" if jax.default_backend() == "tpu"
                       else "float32"),
    )
    with mesh:
        state = replicate(create_train_state(cfg, jax.random.PRNGKey(0)), mesh)
        step_fn = jax.jit(make_train_step(cfg), donate_argnums=0)
        rng = np.random.RandomState(0)
        batch = jax.device_put(
            {
                "image": rng.randint(
                    0, 256,
                    (cfg.n_critic, batch_size, cfg.img_size, cfg.img_size, 3),
                ).astype(np.uint8),
                "label": rng.randint(
                    0, cfg.num_classes, (cfg.n_critic, batch_size)
                ).astype(np.int32),
            },
            batch_sharding(mesh, batch_dim=1),
        )
        state, m = step_fn(state, batch)  # compile + warm
        jax.block_until_ready(m)
        times = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            state, m = step_fn(state, batch)
            jax.block_until_ready(m)
            times.append(time.perf_counter() - t0)
    step_s = statistics.median(times)
    return {
        "n_devices": n_dev,
        "impl": impl,
        "per_chip_batch": args.per_chip_batch,
        "global_batch": batch_size,
        "wall_s_per_step_median": round(step_s, 4),
        "images_per_sec": round(batch_size * cfg.n_critic / step_s, 1),
        "backend": jax.default_backend(),
        # single-chip axon wall-clock is pool-accelerated and CPU timings
        # are interpret-mode — only a real multi-chip TPU mesh makes these
        # wall clocks silicon evidence (BENCH_NOTES "Physics check")
        "wall_clock_meaningful": jax.default_backend() == "tpu" and n_dev > 1,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=str, default="1,2,4,8")
    ap.add_argument("--impls", type=str, default="pallas,xla")
    ap.add_argument("--per-chip-batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--ch", type=int, default=16)
    ap.add_argument("--img-size", type=int, default=64)
    ap.add_argument("--cpu", action="store_true",
                    help="force the 8-device virtual CPU mesh (harness "
                         "validation without hardware)")
    args = ap.parse_args()

    if args.cpu:
        os.environ.setdefault(
            "XLA_FLAGS",
            (os.environ.get("XLA_FLAGS", "")
             + " --xla_force_host_platform_device_count=8").strip())
        import jax

        jax.config.update("jax_platforms", "cpu")

    base = {}
    for n_dev in (int(x) for x in args.devices.split(",")):
        for impl in args.impls.split(","):
            try:
                row = run_one(n_dev, impl, args)
            except Exception as e:  # keep sweeping
                row = {"n_devices": n_dev, "impl": impl,
                       "error": repr(e)[:200]}
            if "error" not in row:
                if (impl not in base) and n_dev == 1:
                    base[impl] = row["images_per_sec"]
                if impl in base and base[impl]:
                    row["scaling_efficiency_vs_1dev"] = round(
                        row["images_per_sec"] / (base[impl] * n_dev), 3)
            print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
