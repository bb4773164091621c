"""Evaluation: FID machinery (optional, off by default like the reference)."""

from pointreggpt_tpu.eval.fid import (
    InceptionFeatures,
    activation_statistics,
    calculate_frechet_distance,
    fid_score,
)

__all__ = [
    "calculate_frechet_distance",
    "activation_statistics",
    "fid_score",
    "InceptionFeatures",
]
