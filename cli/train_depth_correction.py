"""Train the depth-correction mask U-Net.

Mirror of the reference entry point (train_depth_correction.py:1-30).
"""

import argparse

import _path  # noqa: F401

from pointreggpt_tpu.models import MaskUNet
from pointreggpt_tpu.parallel import maybe_initialize_distributed
from pointreggpt_tpu.train import MaskTrainer

parser = argparse.ArgumentParser()
parser.add_argument("--resume", default=None, type=str,
                    help="checkpoint milestone to load (best/latest)")
parser.add_argument("--data", default="./dataset/depth_correction",
                    help="path to the depth-correction dataset")
args = parser.parse_args()

maybe_initialize_distributed()

model = MaskUNet(dim=64, dim_mults=(1, 2, 4, 8))

trainer = MaskTrainer(
    model,
    args.data,
    image_size=256,
    train_batch_size=4,
    train_lr=4e-5,
    lr_gamma=0.95,
    epochs=100,
    results_folder="./depth_correction_results",
    samples_folder="./depth_correction_samples",
)

if args.resume is not None:
    trainer.load(args.resume)
trainer.train_and_eval()
