"""TPU drive: production Generator path (pipelined host loop) end-to-end.

Synthetic 3DMatch tree -> Generator.load -> generate(4 scenes x 2 samples,
250-step DDNM chain at 256^2, depth correction on, memory voxel 0.002) ->
verify the full output contract + resume skip. Exercises the round-2
pipelined dispatch (step k+1 queued before step k's host writes).
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir",
                  "/root/.cache/pointreggpt_xla")

import jax.numpy as jnp
import numpy as np

import tempfile
import os

sys.path.insert(0, "/root/repo/tests")
from test_generate import make_3dmatch_tree

from pointreggpt_tpu.diffusion import GaussianDiffusion
from pointreggpt_tpu.generate import Generator
from pointreggpt_tpu.models import DiffusionUNet, MaskUNet
from pointreggpt_tpu.train import checkpoint as ckpt
from pointreggpt_tpu.train import ema as ema_lib
from pointreggpt_tpu.core import plyio

print(f"backend={jax.default_backend()}")
tmp = Path(tempfile.mkdtemp(prefix="drive_gen_"))
os.chdir(tmp)
folder, info = make_3dmatch_tree(tmp, n_scenes=4)

image_size = 256
model = DiffusionUNet(dim=64, param_cond_dim=4, dim_mults=(1, 2, 4, 8),
                      channels=1, dtype=jnp.bfloat16)
diffusion = GaussianDiffusion(
    apply_fn=lambda p, x, t, pc: model.apply(p, x, t, pc),
    image_size=image_size, timesteps=1000, sampling_timesteps=250,
    loss_type="l1", objective="pred_x0", beta_schedule="sigmoid",
    ddim_sampling_eta=1.0, is_ddnm_sampling=True)
dc_model = MaskUNet(dim=64, dim_mults=(1, 2, 4, 8), dtype=jnp.bfloat16)

gen = Generator(
    model, diffusion, folder, batch_size=4,
    results_folder=str(tmp / "results"),
    samples_folder=str(tmp / "gen/data"),
    depth_correction_model=dc_model,
    depth_correction_results=str(tmp / "dc_results"),
    data_root=str(tmp / "dataset/indoor/data"),
    memory_capacity=1 << 18)

params = model.init(jax.random.PRNGKey(0),
                    jnp.zeros((1, image_size, image_size, 1)),
                    jnp.zeros((1,)), jnp.zeros((1, 4)))
ckpt.save_checkpoint(tmp / "results/model-1.ckpt",
                     {"params": params,
                      "ema": ema_lib.init(params)._asdict()})
dc_params = dc_model.init(jax.random.PRNGKey(1),
                          jnp.zeros((1, image_size, image_size, 1)))
# Random-weight sigmoids top out just UNDER the 0.99 keep threshold
# (measured max 0.9890), so an untrained mask zeroes every pixel and the
# output clouds are empty — correct behavior, but it leaves the fragment
# PLY assertion at the mercy of init luck. Bias the final conv to +6
# (sigmoid 0.9975) so the mask keeps pixels deterministically while the
# MaskUNet compute path still runs at full size.
dc_params = jax.tree_util.tree_map(np.asarray, dc_params)
dc_params["params"]["final_conv"]["bias"] = np.full_like(
    dc_params["params"]["final_conv"]["bias"], 6.0)
ckpt.save_checkpoint(tmp / "dc_results/model-best.ckpt",
                     {"epoch": 0, "params": dc_params})

gen.load(1)
t0 = time.time()
gen.generate(0, 4, num_samples=2, has_refine_step=False, info_train=info)
dt = time.time() - t0
print(f"generate(4 scenes x 2 samples @256^2, 250 steps): {dt:.1f}s "
      f"(incl. compile)")

for sid in range(4):
    scene = tmp / f"gen/data/scene-{sid:06d}"
    for f in ["camera-intrinsics.txt", "sample-000000.image.png",
              "sample-000000.cloud.ply", "sample-000001.pose.txt",
              "sample-000001.image.png", "sample-000001.depth.png",
              "sample-000001.cloud.ply", "sample-000002.pose.txt",
              "sample-000002.image.png", "sample-000002.depth.png",
              "reprojected.image.png", "corrected.image.png"]:
        assert (scene / f).exists(), f"missing {scene / f}"
    pc = plyio.read_ply(scene / "sample-000001.cloud.ply")
    assert pc.shape[0] > 100 and pc.shape[1] == 3
    pose = np.loadtxt(scene / "sample-000001.pose.txt")
    np.testing.assert_allclose(pose[3], [0, 0, 0, 1], atol=1e-6)

# resume probe: a second run over the completed range must skip instantly
t0 = time.time()
gen.generate(0, 4, num_samples=2, has_refine_step=False, info_train=info,
             verbose=False)
print(f"resume probe (all complete): {time.time()-t0:.2f}s (must skip)")

print("GENERATOR TPU DRIVE OK")
