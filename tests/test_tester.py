"""End-to-end Tester tests (successive sampling + scene-memory generate)."""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointreggpt_tpu.core import geometry as G
from pointreggpt_tpu.core import plyio
from pointreggpt_tpu.diffusion import GaussianDiffusion
from pointreggpt_tpu.generate import Tester as SceneTester
from pointreggpt_tpu.models import DiffusionUNet
from pointreggpt_tpu.train import checkpoint as ckpt
from pointreggpt_tpu.train import ema as ema_lib


def make_tester(tmp_path, image_size=32, sampling_timesteps=2):
    model = DiffusionUNet(dim=8, dim_mults=(1, 2), channels=1)
    diffusion = GaussianDiffusion(
        apply_fn=lambda p, x, t, pc: model.apply(p, x, t, pc),
        image_size=image_size, timesteps=8,
        sampling_timesteps=sampling_timesteps, objective="pred_x0",
        beta_schedule="sigmoid", ddim_sampling_eta=1.0)
    tester = SceneTester(model, diffusion, batch_size=2,
                    results_folder=str(tmp_path / "results"),
                    samples_folder=str(tmp_path / "samples"))
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, image_size, image_size, 1)),
                        jnp.zeros((1,)), jnp.zeros((1, 4)))
    ckpt.save_checkpoint(
        tmp_path / "results/model-7.ckpt",
        {"params": params, "ema": ema_lib.init(params)._asdict()})
    tester.load(7)
    return tester


@pytest.mark.slow
class TestTester:
    def test_sample_outputs(self, tmp_path):
        tester = make_tester(tmp_path)
        tester.sample(num_scenes=2, num_samples=2)
        samples = tmp_path / "samples"
        for sid in (0, 1):
            # unconditional first frame: triptych + PLY + intrinsics
            assert (samples / f"scene-{sid}-sample-0.png").exists()
            assert (samples / f"scene-{sid}-sample-0.ply").exists()
            assert (samples / f"scene-{sid}-camera-intrinsics.txt").exists()
            # successive frame outputs
            assert (samples / f"scene-{sid}-sample-1.png").exists()
            assert (samples / f"scene-{sid}-sample-1.ply").exists()
        # triptych is 3x wide
        from PIL import Image
        img = Image.open(samples / "scene-0-sample-1.png")
        assert img.size == (32 * 3, 32)
        # all scenes x samples in one grid (sdd:2088-2096)
        grid = Image.open(samples / "overview.png")
        assert grid.size == (32 * 3 * 2, 32 * 2)
        # intrinsics parse back
        k = np.loadtxt(samples / "scene-0-camera-intrinsics.txt")
        assert k.shape == (3, 3) and k[2, 2] == 1.0

    def test_zero_scenes_is_a_noop(self, tmp_path):
        tester = make_tester(tmp_path)
        tester.sample(num_scenes=0, num_samples=2)
        tester.generate(num_scenes=0, num_samples=2,
                        memory_capacity=2048)
        assert not (tmp_path / "samples/overview.png").exists()

    def test_sample_uncondition_grid(self, tmp_path):
        tester = make_tester(tmp_path)
        images = tester.sample_uncondition(num_samples=4)
        assert images.shape == (4, 32, 32, 1)
        assert (tmp_path / "samples/unconditional.png").exists()

    def test_generate_scene_memory(self, tmp_path):
        tester = make_tester(tmp_path)
        tester.generate(num_scenes=2, num_samples=2, voxel_size=0.05,
                        memory_capacity=4096)
        samples = tmp_path / "samples"
        for sid in (0, 1):
            assert (samples / f"scene-{sid}-sample-0.png").exists()
            assert (samples / f"scene-{sid}-sample-1.png").exists()
            mem = plyio.read_ply(samples / f"scene-{sid}-memory.ply")
            assert mem.shape[1] == 3
            # the reference contract: scene-{sid}.ply at voxel 0.025
            # (sdd:2225-2236); coarser than the memory cloud
            scene = plyio.read_ply(samples / f"scene-{sid}.ply")
            assert 0 < scene.shape[0] <= mem.shape[0]
        # plasma overview grid (sdd:2237-2246): colored, not grayscale
        import numpy as _np
        from PIL import Image
        grid = _np.asarray(Image.open(samples / "overview.png").convert(
            "RGB"), dtype=_np.int32)
        assert grid.shape[:2] == (32 * 2, 32 * 3 * 2)
        assert _np.abs(grid[..., 0] - grid[..., 2]).max() > 0

        # the three jitted memory programs are cached per (voxel, capacity)
        # and reused across generate() calls — a fresh jax.jit object
        # re-loads its executable through the axon tunnel (~60 s measured,
        # tools/profile_pipeline.py)
        assert len(tester._generate_fns) == 1
        fns = tester._generate_fns[(0.05, 4096)]
        tester.generate(num_scenes=1, num_samples=1, voxel_size=0.05,
                        memory_capacity=4096)
        assert tester._generate_fns[(0.05, 4096)] is fns


class TestTesterSmallCapacity:
    def test_generate_with_capacity_below_seed_frame(self, tmp_path):
        """memory_capacity < image_size^2: the seed frame must be bounded
        through keep_nearest (the nearest-to-origin memory policy), not
        crash jnp.pad with a negative pad width."""
        tester = make_tester(tmp_path)  # 32x32 -> seed frame 1024 pts
        tester.generate(num_scenes=1, num_samples=2, voxel_size=0.05,
                        memory_capacity=512)
        samples = tmp_path / "samples"
        assert (samples / "scene-0-sample-1.png").exists()
        mem = plyio.read_ply(samples / "scene-0-memory.ply")
        assert 0 < mem.shape[0] <= 512


class TestDepthImageNp:
    def test_roundtrip_with_point_cloud_np(self):
        k = np.array([[80.0, 0, 16.0], [0, 80.0, 12.0], [0, 0, 1.0]])
        rng = np.random.default_rng(0)
        depth = rng.uniform(1.0, 3.0, (24, 32)).astype(np.float32)
        pc = G.point_cloud_np(depth, k)
        back, mask = G.depth_image_np(pc, k, image_size=(24, 32))
        assert mask.all()
        np.testing.assert_allclose(back, depth, rtol=1e-5)

    def test_zbuffer_min_wins(self):
        k = np.array([[1.0, 0, 0.0], [0, 1.0, 0.0], [0, 0, 1.0]])
        pc = np.array([[0, 0, 3.0], [0, 0, 1.5]])
        depth, mask = G.depth_image_np(pc, k, image_size=(2, 2))
        assert depth[0, 0] == 1.5 and mask[0, 0]


class TestTesterFid:
    def test_fid_score_from_features(self, tmp_path):
        """Tester-scoped FID passthrough (sdd:1915-1935): identical feature
        sets give ~0; shifted Gaussians give the analytic ||dmu||^2 term."""
        from pointreggpt_tpu.diffusion import GaussianDiffusion
        from pointreggpt_tpu.generate import Tester
        from pointreggpt_tpu.models import DiffusionUNet

        model = DiffusionUNet(dim=8, dim_mults=(1, 2), channels=1)
        diffusion = GaussianDiffusion(
            apply_fn=lambda p, x, t, pc: model.apply(p, x, t, pc),
            image_size=16, timesteps=8, sampling_timesteps=2,
            objective="pred_x0", beta_schedule="sigmoid")
        tester = Tester(model, diffusion,
                        results_folder=str(tmp_path / "results"),
                        samples_folder=str(tmp_path / "samples"))
        rng = np.random.default_rng(0)
        feats = rng.standard_normal((256, 8))
        assert abs(tester.fid_score(feats, feats)) < 1e-6
        shifted = feats + 2.0
        fid = tester.fid_score(feats, shifted)
        assert abs(fid - 8 * 4.0) < 1e-6  # ||dmu||^2 = d * 2^2

        mu, sigma = tester.calculate_activation_statistics(feats)
        assert mu.shape == (8,) and sigma.shape == (8, 8)


class TestTesterBakedLoad:
    def test_load_bakes_bf16_model_params(self, tmp_path):
        """Tester.load must hand the sample fns baked inference params for
        low-precision models (models/bake.py): proj kernels bf16 +
        pre-standardized, fp32-consumed kernels untouched."""
        model = DiffusionUNet(dim=8, dim_mults=(1, 2), channels=1,
                              dtype=jnp.bfloat16)
        diffusion = GaussianDiffusion(
            apply_fn=lambda p, x, t, pc: model.apply(p, x, t, pc),
            image_size=16, timesteps=8, sampling_timesteps=2,
            objective="pred_x0", beta_schedule="sigmoid",
            ddim_sampling_eta=1.0)
        tester = SceneTester(model, diffusion, batch_size=1,
                             results_folder=str(tmp_path / "results"),
                             samples_folder=str(tmp_path / "samples"))
        params = model.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 16, 16, 1)), jnp.zeros((1,)),
                            jnp.zeros((1, 4)))
        ckpt.save_checkpoint(
            tmp_path / "results/model-1.ckpt",
            {"params": params, "ema": ema_lib.init(params)._asdict()})
        tester.load(1)
        tree = tester.ema_params["params"]
        assert tree["mid_block1"]["block1"]["proj"]["kernel"].dtype == \
            jnp.bfloat16
        assert tree["final_conv"]["kernel"].dtype == jnp.float32
        # the bake returns a HOST numpy tree; load must device_put it once
        # or every jitted sample call re-uploads the full param tree
        # (measured 28.7 -> 145.8 ms/U-Net-step through the TPU tunnel)
        for leaf in jax.tree_util.tree_leaves(tester.ema_params):
            assert isinstance(leaf, jax.Array), type(leaf)

    def test_load_keeps_fp32_model_params(self, tmp_path):
        tester = make_tester(tmp_path)  # fp32 model
        tree = tester.ema_params["params"]
        assert tree["mid_block1"]["block1"]["proj"]["kernel"].dtype == \
            jnp.float32
