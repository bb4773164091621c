"""Generate the synthetic registration dataset (production path).

Mirror of the reference entry point (generate_dataset.py:1-63): 250-step
DDIM+DDNM, batch 4, depth-correction MaskUNet, scene-range sharding via
-start/-stop, refine step off.
"""

import argparse

import _path  # noqa: F401

import jax.numpy as jnp

from pointreggpt_tpu.diffusion import GaussianDiffusion
from pointreggpt_tpu.generate import Generator
from pointreggpt_tpu.models import DiffusionUNet, MaskUNet
from pointreggpt_tpu.parallel import maybe_initialize_distributed

parser = argparse.ArgumentParser()
parser.add_argument("--resume", default=None, type=str, required=True,
                    help="checkpoint milestone to load")
parser.add_argument("--dataset_name", default="generated_dataset", type=str)
parser.add_argument("--start_scene_index", "-start", default=0, type=int)
parser.add_argument("--stop_scene_index", "-stop", default=1, type=int)
parser.add_argument("--num_samples", default=1, type=int)
parser.add_argument("--data", default="/path/to/3DMatch-RGBD/train",
                    help="path to 3DMatch RGB-D training data")
parser.add_argument("--batch_size", default=8, type=int,
                    help="scenes per device batch (8 is the profiled v5e "
                         "sweet spot; the reference used 4 for one GPU)")
parser.add_argument("--bf16", action="store_true")
args = parser.parse_args()

maybe_initialize_distributed()

model = DiffusionUNet(
    dim=64, param_cond_dim=4, dim_mults=(1, 2, 4, 8), channels=1,
    dtype=jnp.bfloat16 if args.bf16 else jnp.float32)

diffusion = GaussianDiffusion(
    apply_fn=lambda p, x, t, pc: model.apply(p, x, t, pc),
    image_size=256,
    timesteps=1000,
    sampling_timesteps=250,
    loss_type="l1",
    objective="pred_x0",
    beta_schedule="sigmoid",
    ddim_sampling_eta=1.0,
    is_ddnm_sampling=True,
)

depth_correction = MaskUNet(
    dim=64, dim_mults=(1, 2, 4, 8),
    dtype=jnp.bfloat16 if args.bf16 else jnp.float32)

generator = Generator(
    model,
    diffusion,
    args.data,
    batch_size=args.batch_size,
    results_folder="./successive_ddnm_diffusion_results",
    samples_folder=f"./{args.dataset_name}/data",
    depth_correction_model=depth_correction,
)

generator.load(args.resume)
generator.generate(
    start_scene_index=args.start_scene_index,
    stop_scene_index=args.stop_scene_index,
    num_samples=args.num_samples,
    has_refine_step=False,
)
