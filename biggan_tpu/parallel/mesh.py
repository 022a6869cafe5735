"""Device mesh construction.

The reference is single-process/single-GPU with zero parallelism
(SURVEY.md §2.4); all scaling here is mesh-based GSPMD:

- ``data`` axis — data parallelism: batch sharded, gradients and BN
  moments all-reduced over ICI by XLA.
- ``model`` axis — optional tensor parallelism for 256/512px configs
  (large conv/dense kernels sharded on output features).

On a multi-slice deployment, build the mesh from
``jax.experimental.mesh_utils.create_hybrid_device_mesh`` so the ``data``
axis outer dimension rides DCN and everything else stays on ICI; for
single-slice (or the CPU test fixture) a plain contiguous mesh is right.
Multi-host entry is ``jax.distributed.initialize()`` — call
:func:`maybe_init_distributed` once at process start.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def maybe_init_distributed() -> None:
    """Initialize multi-process JAX when launched under a pod runtime.

    Must not touch the XLA backend before ``jax.distributed.initialize``
    (``jax.process_count()`` would initialize it and make ``initialize``
    raise) — so the guard is env-var + idempotency only.
    """
    addr = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if not addr:
        return
    kwargs = {}
    # Manual clusters (no SLURM/GKE autodetect): pass the coordinates
    # explicitly from the env — the multi-process CPU e2e test drives this.
    if os.environ.get("JAX_NUM_PROCESSES"):
        if "JAX_PROCESS_ID" not in os.environ:
            raise RuntimeError(
                "JAX_PROCESS_ID must be set when JAX_NUM_PROCESSES is "
                "(manual cluster launch needs both)"
            )
        kwargs = dict(
            coordinator_address=addr,
            num_processes=int(os.environ["JAX_NUM_PROCESSES"]),
            process_id=int(os.environ["JAX_PROCESS_ID"]),
        )
    try:
        jax.distributed.initialize(**kwargs)
    except RuntimeError as e:
        if "already" not in str(e).lower():
            raise


def create_mesh(
    mesh_shape: Sequence[int] = (-1, 1),
    axis_names: Sequence[str] = ("data", "model"),
    devices: Optional[Sequence[jax.Device]] = None,
    num_slices: int = 1,
) -> Mesh:
    """Build a Mesh; a single ``-1`` dim absorbs all remaining devices.

    ``num_slices > 1`` requests a hybrid (DCN × ICI) mesh where the
    leading ``data`` dimension spans slices over DCN.
    """
    devices = list(devices if devices is not None else jax.devices())
    shape = list(mesh_shape)
    if shape.count(-1) > 1:
        raise ValueError(f"at most one -1 in mesh_shape, got {mesh_shape}")
    known = int(np.prod([s for s in shape if s != -1]))
    if -1 in shape:
        if len(devices) % known != 0:
            raise ValueError(f"{len(devices)} devices not divisible by {known}")
        shape[shape.index(-1)] = len(devices) // known
    total = int(np.prod(shape))
    if total != len(devices):
        raise ValueError(f"mesh shape {shape} needs {total} devices, have {len(devices)}")

    if num_slices > 1:
        if shape[0] % num_slices != 0:
            raise ValueError(
                f"leading (data) mesh dim {shape[0]} not divisible by "
                f"num_slices={num_slices}"
            )
        # hybrid layout only matters when devices actually span >1 physical
        # granule (slice or process); mesh_utils groups devices by these
        # attributes and raises on a single-granule host. On the CPU test
        # fixture / a 1-slice dev box a contiguous reshape produces the
        # identical logical layout (outer data dim = slice index), so the
        # sharding semantics under test are the same.
        def granule(d):
            s = getattr(d, "slice_index", None)
            return ("slice", s) if s is not None else ("proc", getattr(d, "process_index", 0))

        n_granules = len({granule(d) for d in devices})
        if n_granules >= num_slices:
            from jax.experimental import mesh_utils

            per_slice = [shape[0] // num_slices] + list(shape[1:])
            dev_array = mesh_utils.create_hybrid_device_mesh(
                per_slice, [num_slices] + [1] * (len(shape) - 1), devices=devices
            )
            # hybrid mesh returns [dcn, ici, ...]; merge back to `shape`
            dev_array = dev_array.reshape(shape)
        else:
            dev_array = np.asarray(devices).reshape(shape)
    else:
        dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, tuple(axis_names))
