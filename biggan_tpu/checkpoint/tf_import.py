"""Import reference TF checkpoints into the JAX pytree (SURVEY.md §5).

The reference saves through ``MovingAverageOptimizer.swapping_saver``
(ref ``BigGAN_128.py:~240, ~400-430``), so a reference checkpoint's
generator slots hold the **EMA** weights. This tool reads such a
checkpoint with ``tf.train.load_checkpoint`` (TF is CPU-side only) and
maps variables into a :class:`~biggan_tpu.training.train_state.GANTrainState`:

- conv kernels: TF HWIO → ours HWIO (identity — we chose HWIO precisely
  for import parity, see ops/layers.py)
- ``conv2d_transpose`` kernels: TF stores ``[H, W, out, in]`` → transpose
  to our HWIO ``[H, W, in, out]``
- dense kernels ``[in, out]`` → identity
- BN ``moving_mean`` / ``moving_variance`` → ``batch_stats`` collection
- spectral-norm ``u`` vectors (``[1, C_out]``) → ``sn_u`` collection
  (squeezed to ``[C_out]``)
- generator weights land in BOTH ``g_params`` and ``g_ema_params``
  (swapping_saver semantics: the saved slots ARE the EMA)

Exact reference variable scopes could not be byte-verified (the reference
mount was empty — SURVEY.md §0), so matching is two-stage:

1. **Name mapping** via ``NAME_RULES`` regex rewrites covering the
   reconstructed upstream naming.
2. **Shape-based assignment** fallback: remaining TF variables are matched
   to remaining pytree leaves with identical (transposed) shapes, in
   checkpoint order, within the same top scope (generator/discriminator).

Every decision is returned in an :class:`ImportReport`; ``strict=True``
raises if any target leaf is left unmatched.
"""

from __future__ import annotations

import dataclasses
import re
from typing import Dict, List, Optional, Tuple

import jax
import numpy as np

# (pattern, replacement) applied in order to TF variable names. "/" paths on
# both sides; the result is matched against flattened pytree paths.
NAME_RULES: List[Tuple[str, str]] = [
    (r"^generator/", "g/"),
    (r"^discriminator/", "d/"),
    (r"moving_mean$", "mean"),
    (r"moving_variance$", "var"),
    (r"/w$", "/kernel"),
    (r"/b$", "/bias"),
    (r"/beta$", "/bias"),
    (r"/gamma$", "/scale"),
]


@dataclasses.dataclass
class ImportReport:
    matched: Dict[str, str] = dataclasses.field(default_factory=dict)  # tf name → pytree path
    unmatched_tf: List[str] = dataclasses.field(default_factory=list)
    unmatched_tree: List[str] = dataclasses.field(default_factory=list)

    def summary(self) -> str:
        return (
            f"matched={len(self.matched)} "
            f"unmatched_tf={len(self.unmatched_tf)} "
            f"unmatched_tree={len(self.unmatched_tree)}"
        )


def _read_tf_checkpoint(ckpt_path: str) -> Dict[str, np.ndarray]:
    """All non-optimizer variables of a TF checkpoint as numpy arrays."""
    from tensorflow.python.training import py_checkpoint_reader  # CPU-side TF

    reader = py_checkpoint_reader.NewCheckpointReader(ckpt_path)
    out = {}
    for name in reader.get_variable_to_shape_map():
        # skip optimizer slots and the swapping saver's shadow copies
        if any(t in name.lower() for t in ("adam", "beta1_power", "beta2_power",
                                           "exponentialmovingaverage", "global_step")):
            continue
        out[name] = reader.get_tensor(name)
    return out


def _apply_rules(name: str) -> str:
    for pat, repl in NAME_RULES:
        name = re.sub(pat, repl, name)
    return name


def _is_deconv(tf_name: str) -> bool:
    return "deconv" in tf_name or "conv2d_transpose" in tf_name


def _canonical_value(tf_name: str, arr: np.ndarray) -> np.ndarray:
    if _is_deconv(tf_name) and arr.ndim == 4:
        return np.transpose(arr, (0, 1, 3, 2))  # HWOI → HWIO
    if arr.ndim == 2 and arr.shape[0] == 1 and ("/u" in tf_name or tf_name.endswith("u")):
        return arr[0]  # SN u: [1, C] → [C]
    return arr


def _flatten(tree, prefix="") -> Dict[str, np.ndarray]:
    import flax.traverse_util as tu

    flat = tu.flatten_dict(tree, sep="/")
    return {f"{prefix}{k}": v for k, v in flat.items()}


def import_tf_checkpoint(
    ckpt_path: str,
    state,
    strict: bool = False,
) -> Tuple[object, ImportReport]:
    """Load a reference TF checkpoint into ``state`` (a GANTrainState).

    Returns ``(new_state, report)``. Weights that can't be matched keep
    their current (e.g. fresh-init) values unless ``strict``.
    """
    import flax.traverse_util as tu

    tf_vars = _read_tf_checkpoint(ckpt_path)

    # target leaves: params + batch_stats + sn_u for G and D
    targets = {}
    targets.update(_flatten(state.g_params, "g/"))
    targets.update(_flatten(state.d_params, "d/"))
    for coll, tree in state.g_state.items():
        targets.update(_flatten(tree, f"g/{coll}/"))
    for coll, tree in state.d_state.items():
        targets.update(_flatten(tree, f"d/{coll}/"))

    report = ImportReport()
    new_values: Dict[str, np.ndarray] = {}

    # stage 1: name-rule matching
    remaining_tf = {}
    for tf_name, arr in tf_vars.items():
        mapped = _apply_rules(tf_name)
        val = _canonical_value(tf_name, arr)
        if mapped in targets and targets[mapped].shape == val.shape:
            new_values[mapped] = val
            report.matched[tf_name] = mapped
        else:
            remaining_tf[tf_name] = arr

    # stage 2: shape-based assignment within the same top scope
    open_targets = {
        k: v for k, v in targets.items() if k not in new_values
    }
    for tf_name, arr in sorted(remaining_tf.items()):
        val = _canonical_value(tf_name, arr)
        scope = "g/" if tf_name.startswith("generator") else "d/"
        candidates = [
            k for k, v in open_targets.items()
            if k.startswith(scope) and v.shape == val.shape
        ]
        if len(candidates) == 1:
            key = candidates[0]
            new_values[key] = val
            report.matched[tf_name] = key
            del open_targets[key]
        else:
            report.unmatched_tf.append(tf_name)
    report.unmatched_tree = sorted(k for k in targets if k not in new_values)

    if strict and report.unmatched_tree:
        raise ValueError(
            f"strict import failed: unmatched pytree leaves {report.unmatched_tree[:10]}... "
            f"({report.summary()})"
        )

    # rebuild the state pytree
    def rebuild(tree, prefix):
        flat = tu.flatten_dict(tree, sep="/")
        out = {}
        for k, v in flat.items():
            full = f"{prefix}{k}"
            out[k] = (
                jax.numpy.asarray(new_values[full], dtype=v.dtype)
                if full in new_values
                else v
            )
        return tu.unflatten_dict(out, sep="/")

    g_params = rebuild(state.g_params, "g/")
    d_params = rebuild(state.d_params, "d/")
    g_state = {c: rebuild(t, f"g/{c}/") for c, t in state.g_state.items()}
    d_state = {c: rebuild(t, f"d/{c}/") for c, t in state.d_state.items()}

    new_state = state.replace(
        g_params=g_params,
        d_params=d_params,
        # swapping_saver: the checkpointed G weights ARE the EMA weights
        g_ema_params=jax.tree.map(lambda x: x, g_params),
        g_state=g_state,
        d_state=d_state,
    )
    return new_state, report
