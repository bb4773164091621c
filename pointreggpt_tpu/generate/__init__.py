"""The dataset factory: Tester, Generator, gt.log overlap pipeline."""

from pointreggpt_tpu.generate.generator import Generator
from pointreggpt_tpu.generate.gt import (
    compute_overlap_ratio_np,
    gather_gt,
    generate_gt,
    parse_gt_log,
)
from pointreggpt_tpu.generate.tester import Tester

__all__ = [
    "Generator",
    "Tester",
    "generate_gt",
    "gather_gt",
    "parse_gt_log",
    "compute_overlap_ratio_np",
]
