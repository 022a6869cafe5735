from biggan_tpu.eval.fid import compute_fid, compute_statistics, frechet_distance
from biggan_tpu.eval.harness import evaluate_gan
from biggan_tpu.eval.inception import InceptionV3, load_params, make_feature_fn
from biggan_tpu.eval.inception_score import (
    compute_inception_score,
    inception_score_from_probs,
)

__all__ = [
    "compute_fid",
    "compute_statistics",
    "frechet_distance",
    "evaluate_gan",
    "InceptionV3",
    "load_params",
    "make_feature_fn",
    "compute_inception_score",
    "inception_score_from_probs",
]
