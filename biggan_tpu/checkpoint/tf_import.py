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
- BN ``moving_mean`` / ``moving_variance`` and cBN ``pop_mean`` /
  ``pop_var`` → ``batch_stats`` collection
- spectral-norm ``u`` vectors (``[1, C]``) → ``sn_u`` collection
  (squeezed to ``[C]``; for deconv kernels C = C_in, the TF convention —
  see ops/layers.py ``SNConvTranspose2D``)
- generator weights land in BOTH ``g_params`` and ``g_ema_params``
  (swapping_saver semantics: the saved slots ARE the EMA)

Matching is two-stage:

1. **Name mapping.** :func:`reference_name_rules` generates, per
   resolution, the full scope map from the reference's variable tree
   (``generator/resblock_up_16/res1/batch_norm/beta/kernel`` …, derived
   from the upstream layout in SURVEY §2.2/§3.3 and the arch table) onto
   our pytree paths. On a faithful reference checkpoint every variable
   matches here — verified end-to-end by ``tests/test_tf_golden_e2e.py``
   against a reconstructed ``tf.compat.v1`` reference graph.
2. **Shape-based assignment** fallback for fork-delta scopes: remaining
   TF variables are bucketed with remaining pytree leaves by (top scope,
   shape). A bucket is assigned only when the two sides pair 1:1 in
   *natural* name order (digit runs compared numerically, so TF's
   auto-uniquify 'x_2' sorts before 'x_10'); unequal counts are a hard
   error under ``strict``, and multi-element zips — whose correspondence
   is ordering-based, not structural — are strict errors too (reported as
   ``warnings`` in permissive mode). Strict imports must match entirely
   through stage-1 name rules.

Every decision is returned in an :class:`ImportReport` (stage-2
assignments separately in ``shape_matched``); ``strict=True`` raises if
any target leaf is left unmatched or any shape bucket is ambiguous.
"""

from __future__ import annotations

import dataclasses
import re
from typing import Dict, List, Optional, Tuple

import jax
import numpy as np

# Generic leaf-rename rules used when no arch-specific rules apply (kept
# for fork-delta scopes on top of reference_name_rules output).
GENERIC_RULES: List[Tuple[str, str]] = [
    (r"^generator/", "g/"),
    (r"^discriminator/", "d/"),
    # cBN β/γ projections built with tf.layers.dense gain a nested scope
    (r"/(beta|gamma)/dense/", r"/\1/"),
    (r"/pop_mean$", "/mean"),
    (r"/pop_var$", "/var"),
    (r"/moving_mean$", "/mean"),
    (r"/moving_variance$", "/var"),
    (r"/w$", "/kernel"),
    (r"/b$", "/bias"),
]


def _tf_uniquified(base: str, occurrence: int) -> str:
    """TF variable_scope auto-uniquify: 'x', 'x_1', 'x_2', …"""
    return base if occurrence == 0 else f"{base}_{occurrence}"


def reference_name_rules(img_size: int) -> List[Tuple[str, str]]:
    """Regex rules mapping reference variable names → our pytree paths.

    The reference names G blocks by their *output channel multiplier*
    (``resblock_up_16`` … ``resblock_up_1``; ref ``BigGAN_128.generator``,
    :~65-110) and D blocks likewise (``resblock_down_1`` …); repeated
    multipliers (256/512 stacks) get TF's scope auto-uniquify suffix.
    """
    from biggan_tpu.models.arch import get_arch

    arch = get_arch(img_size)
    rules: List[Tuple[str, str]] = [
        (r"^generator/", "g/"),
        (r"^discriminator/", "d/"),
        # heads / top-level scopes
        (r"^g/dense/", "g/fc_seed/"),
        (r"^g/G_logit/", "g/conv_out/"),
        (r"^g/batch_norm/", "g/bn_out/"),
        (r"^g/self_attention/", "g/attn/"),
        (r"^d/self_attention/", "d/attn/"),
        (r"^d/resblock/", "d/block_final/"),
        (r"^d/D_logit/", "d/fc_logit/"),
    ]
    seen: Dict[str, int] = {}
    for i, mult in enumerate(arch.g_ch_mults):
        base = f"resblock_up_{mult}"
        scope = _tf_uniquified(base, seen.get(base, 0))
        seen[base] = seen.get(base, 0) + 1
        rules.append((rf"^g/{scope}/", f"g/block_up_{i}/"))
    seen = {}
    for i, mult in enumerate(arch.d_ch_mults):
        base = f"resblock_down_{mult}"
        scope = _tf_uniquified(base, seen.get(base, 0))
        seen[base] = seen.get(base, 0) + 1
        rules.append((rf"^d/{scope}/", f"d/block_down_{i}/"))
    rules += [
        # cBN FCs built with tf.layers.dense gain a nested 'dense' scope
        (r"/(beta|gamma)/dense/", r"/\1/"),
        # inner block structure: res1/res2/skip sub-scopes (ref ops.py
        # resblock_up_condition/resblock_down/resblock, :~150-247)
        (r"(^g/[^/]+)/res(\d)/batch_norm/", r"\1/cbn\2/"),
        (r"(^d/[^/]+)/res(\d)/batch_norm/", r"\1/bn\2/"),
        (r"/res1/(deconv_0|conv_0)/", "/conv1/"),
        (r"/res2/(deconv_0|conv_0)/", "/conv2/"),
        (r"/skip/(deconv_0|conv_0)/", "/skip/"),
        # leaf renames
        (r"/pop_mean$", "/mean"),
        (r"/pop_var$", "/var"),
        (r"/moving_mean$", "/mean"),
        (r"/moving_variance$", "/var"),
        (r"/w$", "/kernel"),
        (r"/b$", "/bias"),
        # plain-BN affine leaves (contrib batch_norm naming); scoped so the
        # attention γ scalar and the cBN γ/β *projections* are untouched
        (r"/(bn1|bn2|bn_out)/gamma$", r"/\1/scale"),
        (r"/(bn1|bn2|bn_out)/beta$", r"/\1/bias"),
    ]
    return rules


# Backwards-compatible module-level default (generic only).
NAME_RULES = GENERIC_RULES


def _natural_key(name: str):
    """Sort key treating digit runs numerically, so TF auto-uniquify
    suffixes order by layer ('x_2' < 'x_10', unlike lexicographic)."""
    return [int(t) if t.isdigit() else t for t in re.split(r"(\d+)", name)]


@dataclasses.dataclass
class ImportReport:
    matched: Dict[str, str] = dataclasses.field(default_factory=dict)  # tf name → pytree path
    shape_matched: Dict[str, str] = dataclasses.field(default_factory=dict)  # stage-2 subset
    unmatched_tf: List[str] = dataclasses.field(default_factory=list)
    unmatched_tree: List[str] = dataclasses.field(default_factory=list)
    ambiguous: List[str] = dataclasses.field(default_factory=list)  # human-readable bucket notes
    warnings: List[str] = dataclasses.field(default_factory=list)  # multi-element bucket zips

    def summary(self) -> str:
        return (
            f"matched={len(self.matched)} "
            f"(by_shape={len(self.shape_matched)}) "
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


def _apply_rules(name: str, rules: Optional[List[Tuple[str, str]]] = None) -> str:
    for pat, repl in (GENERIC_RULES if rules is None else rules):
        name = re.sub(pat, repl, name)
    # Collection rerouting: SN u vectors live in the ``sn_u`` collection,
    # BN/cBN running stats in ``batch_stats`` — both mirror the module tree.
    parts = name.split("/")
    if len(parts) >= 2 and parts[0] in ("g", "d"):
        if parts[-1] == "u":
            parts.insert(1, "sn_u")
        elif parts[-1] in ("mean", "var"):
            parts.insert(1, "batch_stats")
    return "/".join(parts)


def _is_deconv(tf_name: str) -> bool:
    return "deconv" in tf_name or "conv2d_transpose" in tf_name


def _canonical_value(tf_name: str, arr: np.ndarray) -> np.ndarray:
    if _is_deconv(tf_name) and arr.ndim == 4:
        return np.transpose(arr, (0, 1, 3, 2))  # HWOI → HWIO
    if arr.ndim == 2 and arr.shape[0] == 1 and ("/u" in tf_name or tf_name.endswith("u")):
        return arr[0]  # SN u: [1, C] → [C]
    if arr.shape == (1,) and tf_name.endswith("gamma"):
        return arr.reshape(())  # attention γ: TF [1] → our scalar
    return arr


def _flatten(tree, prefix="") -> Dict[str, np.ndarray]:
    import flax.traverse_util as tu

    flat = tu.flatten_dict(tree, sep="/")
    return {f"{prefix}{k}": v for k, v in flat.items()}


def import_tf_checkpoint(
    ckpt_path: str,
    state,
    strict: bool = False,
    img_size: Optional[int] = None,
) -> Tuple[object, ImportReport]:
    """Load a reference TF checkpoint into ``state`` (a GANTrainState).

    ``img_size`` selects the arch-aware :func:`reference_name_rules`
    (complete stage-1 name matching); without it only the generic rules
    run and stage-2 shape matching carries the load. Returns
    ``(new_state, report)``. Weights that can't be matched keep their
    current (e.g. fresh-init) values unless ``strict``.
    """
    import flax.traverse_util as tu

    rules = reference_name_rules(img_size) if img_size is not None else None
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
        mapped = _apply_rules(tf_name, rules)
        val = _canonical_value(tf_name, arr)
        if mapped in targets and targets[mapped].shape == val.shape:
            new_values[mapped] = val
            report.matched[tf_name] = mapped
        else:
            remaining_tf[tf_name] = arr

    # stage 2: shape-bucket assignment within the same top scope.
    # Bucket key = (top scope, canonical shape). A bucket assigns only when
    # TF variables and open targets pair 1:1 (equal counts, zipped in
    # sorted-name order — checkpoint scopes and our module names both sort
    # in layer order); unequal counts are ambiguous and fail loudly.
    open_targets = {k: v for k, v in targets.items() if k not in new_values}
    buckets: Dict[Tuple[str, tuple], List[str]] = {}
    for tf_name in remaining_tf:
        scope = "g/" if tf_name.startswith("generator") else "d/"
        shape = tuple(_canonical_value(tf_name, remaining_tf[tf_name]).shape)
        buckets.setdefault((scope, shape), []).append(tf_name)
    for (scope, shape), tf_names in sorted(buckets.items(), key=str):
        candidates = sorted(
            (k for k, v in open_targets.items()
             if k.startswith(scope) and tuple(v.shape) == shape),
            key=_natural_key,
        )
        if len(candidates) == len(tf_names):
            if len(tf_names) > 1:
                # A multi-element zip assumes name order == layer order on
                # both sides — natural-sorted, but structurally unverified.
                # Surface it: a warning when permissive, and part of the
                # strict error below (strict demands stage-1 name coverage).
                report.warnings.append(
                    f"shape bucket {scope}{shape}: zipped {len(tf_names)} "
                    f"vars by natural name order "
                    f"({sorted(tf_names, key=_natural_key)[:4]} → {candidates[:4]})"
                )
            for tf_name, key in zip(sorted(tf_names, key=_natural_key), candidates):
                new_values[key] = _canonical_value(tf_name, remaining_tf[tf_name])
                report.matched[tf_name] = key
                report.shape_matched[tf_name] = key
                del open_targets[key]
        else:
            note = (
                f"shape bucket {scope}{shape}: {len(tf_names)} checkpoint "
                f"vars {sorted(tf_names)[:4]} vs {len(candidates)} open "
                f"targets {candidates[:4]}"
            )
            report.ambiguous.append(note)
            report.unmatched_tf.extend(sorted(tf_names))
    report.unmatched_tree = sorted(k for k in targets if k not in new_values)

    if strict and (report.unmatched_tree or report.ambiguous or report.warnings):
        raise ValueError(
            "strict import failed: "
            + (f"ambiguous shape buckets:\n  " + "\n  ".join(report.ambiguous) + "\n"
               if report.ambiguous else "")
            + ("multi-element shape-zip (order unverified — extend the name "
               "rules instead):\n  " + "\n  ".join(report.warnings) + "\n"
               if report.warnings else "")
            + f"unmatched pytree leaves {report.unmatched_tree[:10]} "
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
