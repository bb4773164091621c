"""Compute gt.log overlap metadata for a generated dataset.

Mirror of the reference entry point (generate_gt.py:1-195), with the
KD-tree Python loops replaced by the tiled TPU pairwise-distance kernel.
"""

import argparse

import _path  # noqa: F401

from pointreggpt_tpu.generate import gather_gt, generate_gt

parser = argparse.ArgumentParser()
parser.add_argument("--dataset_name", default="generated_dataset", type=str,
                    required=True)
parser.add_argument("--start_scene_index", "-start", default=0, type=int)
parser.add_argument("--stop_scene_index", "-stop", default=1, type=int)
parser.add_argument("--num_samples", default=2, type=int,
                    help="sample clouds per scene")
parser.add_argument("--disable_tqdm", action="store_true")
args = parser.parse_args()

generate_gt(args.dataset_name, args.start_scene_index, args.stop_scene_index,
            args.num_samples, verbose=not args.disable_tqdm)
gather_gt(args.dataset_name, args.start_scene_index, args.stop_scene_index)
