"""Multi-process CPU cluster e2e (SURVEY §2.4 DCN row).

Launches a real 2-process JAX cluster (gRPC coordinator on localhost, 2
virtual CPU devices per process = 4 global devices) and, inside it,
exercises the two paths no single-process test can reach:

- :func:`biggan_tpu.parallel.mesh.maybe_init_distributed` — the
  multi-host entry point (env-var driven ``jax.distributed.initialize``).
- the REAL ``create_hybrid_device_mesh`` branch of :func:`create_mesh`
  (``num_slices=2`` with two genuine process granules — the single-process
  suite can only take the contiguous-reshape fallback, VERDICT r2 weak #5).

The reference has no distributed anything (SURVEY §2.4); this guards the
TPU framework's own multi-slice entry.
"""

import os
import socket
import subprocess
import sys
import textwrap

import pytest

pytestmark = pytest.mark.slow

_WORKER = textwrap.dedent(
    """
    import os
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=2"
    )
    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from biggan_tpu.parallel.mesh import create_mesh, maybe_init_distributed

    maybe_init_distributed()
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 4, jax.device_count()

    # num_slices=2 with 2 real process granules -> the hybrid-mesh branch
    mesh = create_mesh((4, 1), ("data", "model"), num_slices=2)
    procs = [d.process_index for d in mesh.devices[:, 0]]
    # outer data dim must group by granule (slice-major), so DP gradient
    # all-reduce crosses DCN once, not per-device
    assert procs == sorted(procs), f"data axis not slice-major: {procs}"

    # a global collective over the mesh: sharded sum -> replicated result
    x = jax.make_array_from_callback(
        (8,), NamedSharding(mesh, P("data")), lambda idx: np.arange(8.0)[idx]
    )
    total = jax.jit(jnp.sum, out_shardings=NamedSharding(mesh, P()))(x)
    np.testing.assert_allclose(np.asarray(total), 28.0)
    print("WORKER_OK", flush=True)
    """
)


def test_two_process_cluster_hybrid_mesh(tmp_path):
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    env_base = {
        **os.environ,
        "JAX_COORDINATOR_ADDRESS": f"localhost:{port}",
        "JAX_NUM_PROCESSES": "2",
        "PYTHONPATH": os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    }
    env_base.pop("JAX_PLATFORMS", None)  # worker sets its own

    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    procs = []
    for pid in range(2):
        env = {**env_base, "JAX_PROCESS_ID": str(pid)}
        procs.append(
            subprocess.Popen(
                [sys.executable, str(script)],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
        )
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=180)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multi-process worker timed out")
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"
        assert "WORKER_OK" in out, f"worker {i} no OK marker:\n{out}"
