"""Microbenchmarks for the hot ops: attention and SN power iteration,
XLA path vs Pallas kernel. One JSON line per (op, impl, shape).

``python benchmarks/ops_bench.py``
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp


def _time(fn, *args, iters=20, warmup=3) -> float:
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def bench_attention(batch=8, n=4096, m=1024, d=24, dv=96, dtype=jnp.bfloat16):
    from biggan_tpu.kernels.attention_pallas import flash_attention
    from biggan_tpu.ops.attn import attention_xla

    rng = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(rng, 3)
    q = jax.random.normal(kq, (batch, n, d), dtype)
    k = jax.random.normal(kk, (batch, m, d), dtype)
    v = jax.random.normal(kv, (batch, m, dv), dtype)

    results = []
    for name, fn in [("xla", attention_xla), ("pallas", flash_attention)]:
        fwd = jax.jit(fn)
        grad = jax.jit(jax.grad(lambda q, k, v: jnp.sum(fn(q, k, v).astype(jnp.float32)), (0, 1, 2)))
        results.append({
            "op": "attention", "impl": name,
            "shape": f"b{batch}_n{n}_m{m}_d{d}_dv{dv}",
            "fwd_ms": round(1000 * _time(fwd, q, k, v), 3),
            "fwd_bwd_ms": round(1000 * _time(grad, q, k, v), 3),
        })
    return results


def bench_power_iter(n_in=3 * 3 * 768, n_out=768):
    from biggan_tpu.kernels.power_iter_pallas import power_iteration_fused
    from biggan_tpu.ops.sn import power_iteration

    rng = jax.random.PRNGKey(0)
    w = jax.random.normal(rng, (n_in, n_out))
    u = jax.random.normal(jax.random.fold_in(rng, 1), (n_out,))

    results = []
    for name, fn in [("xla", power_iteration), ("pallas", power_iteration_fused)]:
        jfn = jax.jit(fn)
        results.append({
            "op": "power_iteration", "impl": name,
            "shape": f"in{n_in}_out{n_out}",
            "fwd_ms": round(1000 * _time(jfn, w, u), 3),
        })
    return results


if __name__ == "__main__":
    for r in bench_attention() + bench_power_iter():
        print(json.dumps(r))
