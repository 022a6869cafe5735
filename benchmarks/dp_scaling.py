"""First-silicon-session measurement kit: DP scaling + partition-rule
coverage + checkpoint round-trip, one command (VERDICT r4 next #4).

When real multi-chip hardware is available, run THIS FILE UNMODIFIED:

    python benchmarks/dp_scaling.py --devices 1,2,4,8 --impls pallas,xla
    python benchmarks/dp_scaling.py --devices 8 --impls pallas \\
        --ch 128 --per-chip-batch 4 --conv-impl pallas   # conv/deconv rules

It quantifies (a) DP weak scaling of the full fused train step at fixed
per-chip batch, (b) what the Pallas kernels' ``custom_partitioning``
rules buy vs the XLA path (the wrappers exist to prevent GSPMD's
replicate-operands fallback — kernels/partition.py), and (c) that a mesh
run survives a checkpoint save→restore round-trip (every row runs ≥2
steps, then saves + restores the sharded state and checks the step
counter and a param digest).

Partition-rule routing: ``--ch 128 --img-size 64 --conv-impl pallas``
puts a D conv at 64²×128 (conv3x3.supported: h≥64, 128≤C≤256) and a G
deconv at 32²×256 (deconv3x3s2.supported: 16≤h≤32, 256≤C≤512) INSIDE the
sharded step — the two rules the driver dryrun can't reach at ch=16
(VERDICT r4 weak #8). The default ch=16 config routes attention+SN only.

One JSON row per (n_devices, impl): wall seconds/step (median of
``--iters`` timed steps after warmup), derived img/s, scaling efficiency
vs the 1-device row of the same impl, and ``ckpt_roundtrip_ok``. On a
real TPU mesh the wall clock is meaningful; on the virtual CPU mesh
(``--cpu``) the rows only validate that the harness and both impl paths
execute — CPU interpret-mode Pallas timings are NOT silicon evidence,
and the row is labeled ``"wall_clock_meaningful": false``. Archive rows
to ``docs/bench/r<N>/dp_scaling.jsonl`` (the BENCH_NOTES schema: these
rows ARE the archive format, ``schema`` field included).
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _ckpt_roundtrip(state, workdir) -> bool:
    """Save the sharded state, restore into the same shardings, and check
    the step counter + a params digest — the minimal proof that a mesh
    run survives checkpointing (half of the first-silicon checklist that
    unit tests can't certify on real hardware)."""
    import jax
    import numpy as np

    from biggan_tpu.checkpoint.manager import CheckpointManager

    mgr = CheckpointManager(workdir, keep_n=1)
    try:
        host = jax.device_get(state)
        mgr.save(host)
        restored = mgr.restore(host)
        if restored is None or int(restored.step) != int(state.step):
            return False
        a = np.concatenate(
            [np.ravel(x)[:16] for x in jax.tree.leaves(host.g_params)]
        )
        b = np.concatenate(
            [np.ravel(np.asarray(x))[:16] for x in jax.tree.leaves(restored.g_params)]
        )
        return bool(np.allclose(a, b))
    finally:
        mgr.close()


def run_one(n_dev: int, impl: str, args) -> dict:
    import tempfile

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
        attn_impl=impl, sn_impl=impl, conv_impl=args.conv_impl,
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
        state, m = step_fn(state, batch)  # compile + warm (step 1)
        jax.block_until_ready(m)
        times = []
        for _ in range(max(args.iters, 2)):  # ≥2 post-compile steps
            t0 = time.perf_counter()
            state, m = step_fn(state, batch)
            jax.block_until_ready(m)
            times.append(time.perf_counter() - t0)
        with tempfile.TemporaryDirectory(prefix="dp_scaling_ckpt_") as td:
            ckpt_ok = _ckpt_roundtrip(state, td)
    step_s = statistics.median(times)
    return {
        "schema": "dp_scaling/v2",  # the BENCH_NOTES archive row format
        "n_devices": n_dev,
        "impl": impl,
        "conv_impl": args.conv_impl,
        "ch": args.ch,
        "img_size": args.img_size,
        "per_chip_batch": args.per_chip_batch,
        "global_batch": batch_size,
        "steps_timed": len(times),
        "wall_s_per_step_median": round(step_s, 4),
        "images_per_sec": round(batch_size * cfg.n_critic / step_s, 1),
        "ckpt_roundtrip_ok": ckpt_ok,
        "backend": jax.default_backend(),
        "d_loss": float(m["d_loss"]),
        "g_loss": float(m["g_loss"]),
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
    ap.add_argument("--conv-impl", type=str, default="auto",
                    choices=["auto", "xla", "pallas"],
                    help="pallas + --ch 128 routes the conv/deconv Pallas "
                         "partition rules inside the sharded step")
    ap.add_argument("--cpu", action="store_true",
                    help="force the 8-device virtual CPU mesh (harness "
                         "validation without hardware)")
    args = ap.parse_args()

    if args.cpu:
        # unconditional assign: setdefault would be a no-op when XLA_FLAGS
        # is already set, silently dropping the device-count flag (ADVICE r4)
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + " --xla_force_host_platform_device_count=8"
            ).strip()
        import jax

        jax.config.update("jax_platforms", "cpu")

    device_counts = sorted(int(x) for x in args.devices.split(","))
    if device_counts and device_counts[0] != 1:
        # no-silent-caps convention: without a 1-device row the
        # scaling_efficiency_vs_1dev metric cannot be emitted
        print(json.dumps({"note": "no 1-device baseline in --devices; "
                          "scaling_efficiency_vs_1dev will be omitted"}),
              flush=True)
    base = {}
    for n_dev in device_counts:
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
