"""Qualitative depth-correction eval on 3DMatch test reprojections.

Mirror of the reference entry point (test_depth_correction.py:1-24).
"""

import argparse
import pickle

import _path  # noqa: F401

from pointreggpt_tpu.models import MaskUNet
from pointreggpt_tpu.train import MaskTester

parser = argparse.ArgumentParser()
parser.add_argument("--resume", default=None, type=str,
                    help="checkpoint milestone to load (best/latest)")
parser.add_argument("--data", default="/path/to/3DMatch-RGBD/test",
                    help="path to 3DMatch RGB-D test set")
parser.add_argument("--info", default="./dataset/indoor/metadata/3DMatch.pkl",
                    help="test pair metadata pickle")
parser.add_argument("--limit", default=None, type=int,
                    help="cap the number of evaluated pairs")
args = parser.parse_args()

with open(args.info, "rb") as f:
    info = pickle.load(f)

model = MaskUNet(dim=64, dim_mults=(1, 2, 4, 8))

tester = MaskTester(
    model,
    args.data,
    info=info,
    image_size=256,
    results_folder="./depth_correction_results",
    samples_folder="./depth_correction_samples",
)

if args.resume is not None:
    tester.load(args.resume)
tester.test(limit=args.limit)
