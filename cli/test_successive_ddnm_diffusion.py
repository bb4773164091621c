"""Qualitative successive sampling (quick 32-step DDIM config).

Mirror of the reference entry point (test_successive_ddnm_diffusion.py:1-45).
"""

import argparse

import _path  # noqa: F401

import jax.numpy as jnp

from pointreggpt_tpu.diffusion import GaussianDiffusion
from pointreggpt_tpu.generate import Tester
from pointreggpt_tpu.models import DiffusionUNet

parser = argparse.ArgumentParser()
parser.add_argument("--resume", default=None, type=str,
                    help="checkpoint milestone to load")
parser.add_argument("--num_scenes", default=4, type=int)
parser.add_argument("--num_samples", default=4, type=int)
parser.add_argument("--bf16", action="store_true")
args = parser.parse_args()

model = DiffusionUNet(
    dim=64, param_cond_dim=4, dim_mults=(1, 2, 4, 8), channels=1,
    dtype=jnp.bfloat16 if args.bf16 else jnp.float32)

diffusion = GaussianDiffusion(
    apply_fn=lambda p, x, t, pc: model.apply(p, x, t, pc),
    image_size=256,
    timesteps=1000,
    sampling_timesteps=32,
    loss_type="l1",
    objective="pred_x0",
    beta_schedule="sigmoid",
    ddim_sampling_eta=1.0,
    is_ddnm_sampling=True,
)

tester = Tester(
    model,
    diffusion,
    batch_size=4,
    results_folder="./successive_ddnm_diffusion_results",
    samples_folder="./successive_ddnm_diffusion_samples",
)

tester.load(args.resume)
tester.sample(num_scenes=args.num_scenes, num_samples=args.num_samples)
