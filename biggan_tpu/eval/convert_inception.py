"""Convert standard FID Inception weights → the npz this framework loads.

Zero-egress environments can't fetch weights, so :func:`eval.inception.load_params`
falls back to a labeled random init. When exact, literature-comparable FID
is needed, obtain the standard FID weights file on a connected machine —
``pt_inception-2015-12-05-6726825d.pth`` (the TF-slim port used by
pytorch-fid / clean-fid) — and run:

    python -m biggan_tpu.eval.convert_inception pt_inception-2015-12-05.pth inception.npz
    export BIGGAN_TPU_INCEPTION_WEIGHTS=inception.npz

Mapping notes (torch state_dict → flax tree of eval/inception.py):

- conv weights ``[out, in, h, w]`` → HWIO ``transpose(2, 3, 1, 0)``
- ``.bn.{weight,bias,running_mean,running_var}`` → ``bn_{scale,bias,mean,var}``
- branch names: ``branch1x1→b0``, ``branch5x5_1/2→b1a/b1b``,
  ``branch3x3dbl_1/2/3→b2a/b2b/b2c``, ``branch_pool→b3`` (A blocks);
  ``branch3x3→b0``, ``branch3x3dbl_*→b1a..c`` (reduction A);
  ``branch7x7_1/2/3→b1a..c``, ``branch7x7dbl_1..5→b2a..e`` (B blocks);
  ``branch3x3_1/2→b0a/b0b``, ``branch7x7x3_1..4→b1a..d`` (reduction B);
  ``branch3x3_1→b1a``, ``branch3x3_2a/2b→b1b/b1c``,
  ``branch3x3dbl_3a/3b→b2c/b2d`` (C blocks);
- ``fc`` ``[1008, 2048]`` → ``logits/kernel`` ``[2048, 1008]``.

This converter is structural-only (no network access); it raises with the
list of unconsumed keys if the input naming does not match.
"""

from __future__ import annotations

import sys
from typing import Dict

import numpy as np

_BRANCH_MAPS = {
    "mixed_a": {  # Mixed_5b/5c/5d
        "branch1x1": "b0",
        "branch5x5_1": "b1a", "branch5x5_2": "b1b",
        "branch3x3dbl_1": "b2a", "branch3x3dbl_2": "b2b", "branch3x3dbl_3": "b2c",
        "branch_pool": "b3",
    },
    "red_a": {  # Mixed_6a
        "branch3x3": "b0",
        "branch3x3dbl_1": "b1a", "branch3x3dbl_2": "b1b", "branch3x3dbl_3": "b1c",
    },
    "mixed_b": {  # Mixed_6b..6e
        "branch1x1": "b0",
        "branch7x7_1": "b1a", "branch7x7_2": "b1b", "branch7x7_3": "b1c",
        "branch7x7dbl_1": "b2a", "branch7x7dbl_2": "b2b", "branch7x7dbl_3": "b2c",
        "branch7x7dbl_4": "b2d", "branch7x7dbl_5": "b2e",
        "branch_pool": "b3",
    },
    "red_b": {  # Mixed_7a
        "branch3x3_1": "b0a", "branch3x3_2": "b0b",
        "branch7x7x3_1": "b1a", "branch7x7x3_2": "b1b",
        "branch7x7x3_3": "b1c", "branch7x7x3_4": "b1d",
    },
    "mixed_c": {  # Mixed_7b/7c
        "branch1x1": "b0",
        "branch3x3_1": "b1a", "branch3x3_2a": "b1b", "branch3x3_2b": "b1c",
        "branch3x3dbl_1": "b2a", "branch3x3dbl_2": "b2b",
        "branch3x3dbl_3a": "b2c", "branch3x3dbl_3b": "b2d",
        "branch_pool": "b3",
    },
}

_BLOCK_KIND = {
    "Mixed_5b": "mixed_a", "Mixed_5c": "mixed_a", "Mixed_5d": "mixed_a",
    "Mixed_6a": "red_a",
    "Mixed_6b": "mixed_b", "Mixed_6c": "mixed_b", "Mixed_6d": "mixed_b",
    "Mixed_6e": "mixed_b",
    "Mixed_7a": "red_b",
    "Mixed_7b": "mixed_c", "Mixed_7c": "mixed_c",
}

_STEM = {
    "Conv2d_1a_3x3": "Conv2d_1a", "Conv2d_2a_3x3": "Conv2d_2a",
    "Conv2d_2b_3x3": "Conv2d_2b", "Conv2d_3b_1x1": "Conv2d_3b",
    "Conv2d_4a_3x3": "Conv2d_4a",
}

_PARAM = {
    ("conv", "weight"): ("conv/kernel", lambda a: a.transpose(2, 3, 1, 0)),
    ("bn", "weight"): ("bn_scale", None),
    ("bn", "bias"): ("bn_bias", None),
    ("bn", "running_mean"): ("bn_mean", None),
    ("bn", "running_var"): ("bn_var", None),
}


def convert(state_dict: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """torch InceptionV3 (pytorch-fid naming) state_dict → flat npz dict
    keyed ``params/<module>/<leaf>`` matching eval/inception.py."""
    out: Dict[str, np.ndarray] = {}
    leftover = []
    for key, val in state_dict.items():
        val = np.asarray(val)
        parts = key.split(".")
        if parts[0] == "fc":
            if parts[1] == "weight":
                out["params/logits/kernel"] = val.T
            else:
                out["params/logits/bias"] = val
            continue
        if parts[0] in _STEM and len(parts) == 3:
            scope = _STEM[parts[0]]
            mapped = _PARAM.get((parts[1], parts[2]))
            if mapped:
                leaf, tf = mapped
                out[f"params/{scope}/{leaf}"] = tf(val) if tf else val
                continue
        if parts[0] in _BLOCK_KIND and len(parts) == 4:
            branch_map = _BRANCH_MAPS[_BLOCK_KIND[parts[0]]]
            branch = branch_map.get(parts[1])
            mapped = _PARAM.get((parts[2], parts[3]))
            if branch and mapped:
                leaf, tf = mapped
                out[f"params/{parts[0]}/{branch}/{leaf}"] = tf(val) if tf else val
                continue
        if "num_batches_tracked" in key or key.startswith("AuxLogits"):
            continue  # unused
        leftover.append(key)
    if leftover:
        raise ValueError(f"unrecognized keys (naming mismatch?): {leftover[:10]}")
    return out


def main(argv=None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    if len(argv) != 2:
        print(__doc__)
        return 2
    src, dst = argv
    import torch  # CPU torch is available in this image

    sd = torch.load(src, map_location="cpu")
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    arrays = convert({k: v.numpy() for k, v in sd.items()})
    np.savez(dst, **arrays)
    print(f"wrote {dst}: {len(arrays)} arrays")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
