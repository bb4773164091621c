"""Train the successive-DDNM depth-inpainting diffusion model.

Mirror of the reference entry point (train_successive_ddnm_diffusion.py:1-47)
with the same hyperparameters; the edit-the-source data path becomes a flag.
"""

import argparse

import _path  # noqa: F401

import jax.numpy as jnp

from pointreggpt_tpu.diffusion import GaussianDiffusion
from pointreggpt_tpu.models import DiffusionUNet
from pointreggpt_tpu.parallel import maybe_initialize_distributed
from pointreggpt_tpu.train import Trainer

parser = argparse.ArgumentParser()
parser.add_argument("--resume", default=None, type=int,
                    help="checkpoint milestone to load")
parser.add_argument("--data", default="/path/to/3DMatch-RGBD/train",
                    help="path to 3DMatch RGB-D training data")
parser.add_argument("--gt_log", default="./dataset/3DMatch/metadata/gt.log",
                    help="training frame list")
parser.add_argument("--batch_size", default=32, type=int)
parser.add_argument("--train_num_steps", default=2000000, type=int)
parser.add_argument("--fp32", action="store_true",
                    help="disable the bfloat16 U-Net compute default")
parser.add_argument("--no_remat", action="store_true",
                    help="disable ResnetBlock rematerialization")
args = parser.parse_args()

maybe_initialize_distributed()

# bf16 compute + remat are the TPU production defaults: 43.4 img/s/chip at
# 256^2 with the reference's global batch 32 (measured on v5e).
model = DiffusionUNet(
    dim=64, param_cond_dim=4, dim_mults=(1, 2, 4, 8), channels=1,
    dtype=jnp.float32 if args.fp32 else jnp.bfloat16,
    remat=not args.no_remat)

diffusion = GaussianDiffusion(
    apply_fn=lambda p, x, t, pc: model.apply(p, x, t, pc),
    image_size=256,
    timesteps=1000,
    sampling_timesteps=250,
    loss_type="l1",
    objective="pred_x0",
    beta_schedule="sigmoid",
    ddim_sampling_eta=0.0,
    is_ddnm_sampling=True,
)

trainer = Trainer(
    model,
    diffusion,
    args.data,
    train_batch_size=args.batch_size,
    train_lr=8e-5,
    train_num_steps=args.train_num_steps,
    gradient_accumulate_every=2,
    augment_horizontal_flip=True,
    ema_decay=0.995,
    save_and_sample_every=1000,
    num_samples=25,
    results_folder="./successive_ddnm_diffusion_results",
    samples_folder="./successive_ddnm_diffusion_samples",
    gt_log=args.gt_log,
)

if args.resume is not None:
    trainer.load(args.resume)
trainer.train()
