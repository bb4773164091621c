"""End-to-end drive: geometry -> condition -> jitted DDIM/DDNM scan (with
BAKED inference params) -> pointops -> PLY roundtrip -> overlap.

Checks: baked-params forward parity within bf16 noise (one-bf16-ulp weight
contract, models/bake.py), DDNM masked-pixel pinning (exact with refine
off, broken by refine as expected), steady-state chain time, PLY
write/read identity, self-overlap 1.0.

Runs CPU-forced by default (safe while the axon tunnel is down); set
PRGPT_DRIVE_TPU=1 to run on the real chip.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/drive_e2e.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if not os.environ.get("PRGPT_DRIVE_TPU"):
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from pointreggpt_tpu.core import geometry as G
from pointreggpt_tpu.core import plyio
from pointreggpt_tpu.core import pointops as P
from pointreggpt_tpu.core import sampling as S
from pointreggpt_tpu.diffusion import GaussianDiffusion
from pointreggpt_tpu.models import DiffusionUNet, maybe_bake
from pointreggpt_tpu.models.bake import BF16_NOISE_REL

H = 32
print("backend:", jax.default_backend())

# synthetic plane depth map, slightly tilted
yy, xx = np.meshgrid(np.arange(H), np.arange(H), indexing="ij")
depth = (2.0 + 0.004 * xx + 0.002 * yy).astype(np.float32)  # meters
intr = np.array([[[40.0, 0, H / 2], [0, 40.0, H / 2], [0, 0, 1]]], np.float32)

key = jax.random.PRNGKey(0)
pose = S.random_sample_pose(key, 1)
depth01 = jnp.asarray(depth[None]) / 10.0
cond = G.image_condition(depth01, jnp.asarray(intr), pose,
                         use_occlusion_filter=True)
# cond is normalized to [-1, 1]; the validity mask is channel 1 (>0 there
# means mask01 > 0.5 — channel 0 is the depth, negative for depths < 5 m)
print("cond: valid frac", float((cond[..., 1] > 0).mean()))

model = DiffusionUNet(dim=16, param_cond_dim=4, dim_mults=(1, 2), channels=1,
                      dtype=jnp.bfloat16)
params = model.init(jax.random.PRNGKey(1), jnp.zeros((1, H, H, 1)),
                    jnp.zeros((1,)), jnp.zeros((1, 4)))
# the changed code under test; device_put once like every production
# consumer (the bake returns a host numpy tree)
baked = jax.device_put(maybe_bake(params, model.dtype))

# sanity: bake actually engaged (bf16 kernels) and the forward agrees to
# bf16 noise (weights match the in-step path to one bf16 ulp; lax.rsqrt is
# approximate, so bitwise is not expected — models/bake.py)
kb = baked["params"]["mid_block1"]["block1"]["proj"]["kernel"]
assert jnp.asarray(kb).dtype == jnp.bfloat16, kb.dtype
fwd = jax.jit(lambda p, xx: model.apply(
    p, xx, jnp.array([500.0]), G.param_vector(jnp.asarray(intr))))
ya = np.asarray(fwd(params, depth01[..., None]), np.float32)
yb = np.asarray(fwd(baked, depth01[..., None]), np.float32)
d = np.abs(ya - yb).max()
assert d <= BF16_NOISE_REL * max(np.abs(ya).max(), 1e-3), d
print(f"baked forward within bf16 noise (max|d|={d:.2e}): OK")

diffusion = GaussianDiffusion(
    apply_fn=lambda p, x, t, pc: model.apply(p, x, t, pc),
    image_size=H, timesteps=100, sampling_timesteps=16,
    objective="pred_x0", beta_schedule="sigmoid", ddim_sampling_eta=0.0)

pc = G.param_vector(jnp.asarray(intr))
sample = jax.jit(lambda p, k, pc, ic, refine: diffusion.sample(
    p, k, param_cond=pc, img_cond=ic, has_refine_step=refine),
    static_argnums=(4,))

t0 = time.time()
img = sample(baked, jax.random.PRNGKey(2), pc, cond, False)
img.block_until_ready()
t1 = time.time()
img2 = sample(baked, jax.random.PRNGKey(3), pc, cond, False)
img2.block_until_ready()
t2 = time.time()
print(f"sample: first {t1-t0:.1f}s steady {t2-t1:.2f}s")

# DDNM pinning: masked pixels == conditioned depth exactly when refine off
from pointreggpt_tpu.core.geometry import unnormalize_to_zero_to_one
cond01 = np.asarray(unnormalize_to_zero_to_one(cond))
mask = cond01[..., 1] > 0.5
im = np.squeeze(np.asarray(img), -1)
pin_err = np.abs(im - cond01[..., 0])[mask]
assert pin_err.size > 0 and pin_err.max() < 1e-5, pin_err.max()
print(f"DDNM pinning ({pin_err.size} masked px, max {pin_err.max():.2e}): OK")

imgr = sample(baked, jax.random.PRNGKey(2), pc, cond, True)
imr = np.squeeze(np.asarray(imgr), -1)
pr = np.abs(imr - cond01[..., 0])[mask]
assert pr.max() > 1e-5  # refine un-pins (expected)
print("refine un-pins masked px (expected): OK")

# pointops + PLY roundtrip
pts, valid = G.depth_to_points(jnp.squeeze(img, -1) * 10.0, jnp.asarray(intr))
dpts, dvalid = P.voxel_downsample(pts[0], valid[0], 0.05)
n = int(dvalid.sum())
assert n > 10, n
ply = "/tmp/drive_e2e.ply"
plyio.write_ply(ply, np.asarray(dpts)[np.asarray(dvalid)])
back = plyio.read_ply(ply)
np.testing.assert_allclose(back, np.asarray(dpts)[np.asarray(dvalid)],
                           atol=1e-6)
r12, r21 = P.overlap_ratio(jnp.asarray(back), jnp.ones((len(back),), bool),
                           jnp.asarray(back), jnp.ones((len(back),), bool),
                           voxel_size=0.05)
# self-overlap is 1.0 up to one fp32 ulp: the ratio is computed on device
# as sum * (1/n), and TPU's reciprocal rounding gives 0.99999994 for some n
assert float(r12) > 0.99999 and float(r21) > 0.99999, \
    (float(r12), float(r21))
print(f"PLY roundtrip {n} pts + self-overlap 1.0: OK")
print("DRIVE OK")
