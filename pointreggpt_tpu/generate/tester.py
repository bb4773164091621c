"""Qualitative sampling driver (Tester): successive scene synthesis.

Reference: Tester sdd:1829-2247.
- ``sample``: unconditional first frame, then successive frames under a
  fixed forward motion (t = [0, 0, 0.5]); saves per-step triptych PNGs
  (previous | reprojected | generated) and per-sample PLYs in the
  accumulated world frame.
- ``generate``: same, but carries a growing voxel-downsampled *scene memory*
  cloud re-projected each step, with random FoV-bounded poses.

All device math (reproject, occlusion filter, DDNM chain, memory voxel
maintenance) is jitted; the host only writes PNG/PLY files.
"""

from __future__ import annotations

import math
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from pointreggpt_tpu.core import geometry as G
from pointreggpt_tpu.core import plyio
from pointreggpt_tpu.core import pointops as P
from pointreggpt_tpu.core import sampling as S
from pointreggpt_tpu.diffusion import GaussianDiffusion
from pointreggpt_tpu.models import bake
from pointreggpt_tpu.parallel import mesh as M
from pointreggpt_tpu.train import checkpoint as ckpt


def _imsave(path, vis: np.ndarray, cmap: str) -> None:
    """Colormapped [0,1] image to PNG — the reference saves all Tester
    visualizations with ``plt.imsave(..., cmap=, vmin=0, vmax=1)``
    (gray in ``sample`` sdd:2060-2067, plasma in ``generate`` sdd:2200)."""
    from matplotlib import image as mpimg

    Path(path).parent.mkdir(parents=True, exist_ok=True)
    mpimg.imsave(str(path), np.clip(vis, 0.0, 1.0), cmap=cmap, vmin=0,
                 vmax=1)


def save_triptych(path, image_prev: np.ndarray, image_rpj: np.ndarray,
                  image_new: np.ndarray, cmap: str = "gray") -> np.ndarray:
    """Save [prev | reprojected | new] as one PNG (sdd:1984-1998); returns
    the concatenated row so callers can build the final overview grid."""
    vis = np.concatenate([image_prev, image_rpj, image_new], axis=-1)
    _imsave(path, vis, cmap)
    return vis


class Tester:
    """Successive-generation sampler around a trained diffusion model.

    The scene batch of every jitted fn (sampling chain, reproject, memory
    update) is sharded over the local mesh's ``data`` axis with params
    replicated — one process drives all local chips (mesh-DP; the reference
    only reaches multi-GPU through one-Accelerate-process-per-device).
    Batches not divisible by the device count fall back to replicated.
    """

    def __init__(self,
                 model,
                 diffusion: GaussianDiffusion,
                 *,
                 batch_size: int = 16,
                 results_folder: str = "./results",
                 samples_folder: str = "./samples",
                 seed: int = 0,
                 mesh=None):
        self.mesh = mesh if mesh is not None else M.create_mesh()
        self.model = model
        self.diffusion = diffusion
        self.batch_size = batch_size
        self.image_size = diffusion.image_size
        self.results_folder = Path(results_folder)
        self.samples_folder = Path(samples_folder)
        self.samples_folder.mkdir(parents=True, exist_ok=True)
        self.seed = seed
        self.ema_params = None

        self._sample_fn = jax.jit(
            lambda p, k, pc, ic: self.diffusion.sample(
                p, k, param_cond=pc, img_cond=ic))
        self._sample_uncond_fn = jax.jit(
            lambda p, k, pc: self.diffusion.sample(p, k, param_cond=pc))
        self._reproject_fn = jax.jit(self._reproject_impl)
        # generate()'s memory-update programs, cached per (voxel_size,
        # memory_capacity): a fresh jax.jit object re-loads its executable
        # through the axon tunnel on first dispatch (~60 s measured with a
        # warm persistent cache), so repeated generate() calls must reuse
        # one wrapper (see generate/generator.py Generator._step_fns)
        self._generate_fns = {}

    def _reproject_impl(self, images01, intrinsic, pose, apply_occlusion):
        depth, mask = G.reproject(images01[..., 0] * 10.0, intrinsic, pose)
        depth_f, mask_f = G.occlusion_filter(depth, mask)
        depth = jnp.where(apply_occlusion, depth_f, depth)
        # build the condition image in the same program: op-by-op host
        # dispatch costs ~28 ms per primitive through the tunnel
        img_cond = G.normalize_to_neg_one_to_one(
            jnp.stack([depth * 0.1, mask.astype(jnp.float32)], axis=-1))
        return depth, img_cond

    # ------------------------------------------------------------------
    def load(self, milestone) -> None:
        """Load {params, ema} from a Trainer checkpoint (sdd:1896-1913)."""
        dummy = self.model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, self.image_size, self.image_size,
                       self.diffusion.channels)), jnp.zeros((1,)),
            jnp.zeros((1, 4)))
        target_params = jax.tree_util.tree_map(np.asarray, dummy)
        state, meta = ckpt.load_checkpoint(
            self.results_folder / f"model-{milestone}.ckpt",
            {"params": target_params,
             "ema": {"params": target_params, "step": 0, "initted": False}})
        # params replicated on every local chip (mesh-DP), baked for
        # inference (pre-standardized WSConv kernels + bf16 weight copies;
        # within one bf16 ulp of the in-step path, models/bake.py)
        self.ema_params = M.replicate(
            self.mesh, bake.maybe_bake(state["ema"]["params"],
                                       self.model.dtype))
        if meta.get("version"):
            print(f"loading from version {meta['version']}")

    # ------------------------------------------------------------------
    # FID helpers (reference: Tester sdd:1915-1935). Features run as a
    # jitted XLA program on the default device (eval/inception.py); torch
    # only loads a weight file. Fréchet math is always available.
    def compute_inception_features(self, samples01: np.ndarray) -> np.ndarray:
        """(n, h, w, 1|3) [0,1] images -> (n, 2048) activations (sdd:1915)."""
        from pointreggpt_tpu.eval.fid import InceptionFeatures

        if getattr(self, "_inception", None) is None:
            self._inception = InceptionFeatures()
        return self._inception(np.asarray(samples01))

    @staticmethod
    def calculate_activation_statistics(features: np.ndarray):
        """(n, d) activations -> (mu, sigma) (sdd:1924-1928)."""
        from pointreggpt_tpu.eval.fid import activation_statistics

        return activation_statistics(features)

    def fid_score(self, real_features: np.ndarray,
                  fake_features: np.ndarray) -> float:
        """FID between two activation sets (sdd:1930-1935)."""
        from pointreggpt_tpu.eval.fid import calculate_frechet_distance

        m1, s1 = self.calculate_activation_statistics(real_features)
        m2, s2 = self.calculate_activation_statistics(fake_features)
        return calculate_frechet_distance(m1, s1, m2, s2)

    def _random_intrinsics(self, key, batch: int) -> np.ndarray:
        intr = np.asarray(S.random_sample_intrinsic(key, batch))
        return G.intrinsic_transform(
            intr, resize=self.image_size,
            centercrop=self.image_size).astype(np.float32)

    def sample_uncondition(self, num_samples: int = 25) -> np.ndarray:
        """Unconditional grid (sdd:1937-1958)."""
        from pointreggpt_tpu.train.trainer import save_image_grid

        key = jax.random.PRNGKey(self.seed)
        k1, k2 = jax.random.split(key)
        intrinsic = self._random_intrinsics(k1, num_samples)
        images = self._sample_uncond_fn(
            self.ema_params, k2,
            G.param_vector(M.shard_batch(self.mesh, intrinsic)))
        images = np.asarray(images)
        save_image_grid(images, self.samples_folder / "unconditional.png",
                        nrow=int(math.isqrt(num_samples)))
        return images

    # ------------------------------------------------------------------
    def sample(self, num_scenes: int, num_samples: int) -> None:
        """Successive conditional generation with fixed forward motion.

        Reference: sdd:1960-2097.
        """
        key = jax.random.PRNGKey(self.seed)
        done = 0
        b_idx = 0
        overview_rows = []  # one triptych strip per scene (sdd:2088-2096)
        while done < num_scenes:
            batch = min(self.batch_size, num_scenes - done)
            key, k_intr, k_s = jax.random.split(key, 3)
            intrinsic = self._random_intrinsics(k_intr, batch)
            intr_sh = M.shard_batch(self.mesh, intrinsic)
            param_cond = G.param_vector(intr_sh)
            absolute_pose = np.tile(np.eye(4, dtype=np.float32),
                                    (batch, 1, 1))

            images = np.asarray(
                self._sample_uncond_fn(self.ema_params, k_s, param_cond))

            scene_rows = [[] for _ in range(batch)]
            for scene_idx in range(batch):
                sid = b_idx * self.batch_size + scene_idx
                img = images[scene_idx, ..., 0]
                scene_rows[scene_idx].append(save_triptych(
                    self.samples_folder / f"scene-{sid}-sample-0.png",
                    np.zeros_like(img), np.zeros_like(img), img))
                pc = G.point_cloud_np(img * 10, intrinsic[scene_idx],
                                      clip=(0.5, 3.5))
                plyio.write_ply(
                    self.samples_folder / f"scene-{sid}-sample-0.ply", pc)
                np.savetxt(
                    self.samples_folder /
                    f"scene-{sid}-camera-intrinsics.txt",
                    intrinsic[scene_idx])

            for sample_idx in range(1, num_samples):
                relative_pose = np.tile(np.eye(4, dtype=np.float32),
                                        (batch, 1, 1))
                relative_pose[:, :3, 3] = [0.0, 0.0, 0.5]
                absolute_pose = relative_pose @ absolute_pose

                apply_occ = jnp.asarray(
                    float(np.sum(absolute_pose[..., :3, 3]**2) != 0))
                images_sh, pose_sh = M.shard_batch(
                    self.mesh, (images, relative_pose))
                depth_rpj, img_cond = self._reproject_fn(
                    images_sh, intr_sh, pose_sh, apply_occ)
                images_rpj = np.asarray(depth_rpj) * 0.1

                key, k_s = jax.random.split(key)
                images_last = images
                images = np.asarray(
                    self._sample_fn(self.ema_params, k_s, param_cond,
                                    img_cond))

                for scene_idx in range(batch):
                    sid = b_idx * self.batch_size + scene_idx
                    scene_rows[scene_idx].append(save_triptych(
                        self.samples_folder /
                        f"scene-{sid}-sample-{sample_idx}.png",
                        images_last[scene_idx, ..., 0],
                        images_rpj[scene_idx],
                        images[scene_idx, ..., 0]))
                    pc = G.point_cloud_np(images[scene_idx, ..., 0] * 10,
                                          intrinsic[scene_idx],
                                          clip=(0.5, 3.5))
                    # accumulated world frame: p' = (p - t) @ R (sdd:2072)
                    pc = (pc - absolute_pose[scene_idx, :3, 3]) @ \
                        absolute_pose[scene_idx, :3, :3]
                    plyio.write_ply(
                        self.samples_folder /
                        f"scene-{sid}-sample-{sample_idx}.ply", pc)

            overview_rows += [np.concatenate(r, axis=-1)
                              for r in scene_rows]
            done += batch
            b_idx += 1

        # all scenes x all samples in one grid (sdd:2088-2096)
        if overview_rows:
            _imsave(self.samples_folder / "overview.png",
                    np.concatenate(overview_rows, axis=0), "gray")

    # ------------------------------------------------------------------
    def _build_generate_fns(self, voxel_size: float, memory_capacity: int):
        """The three jitted memory programs behind :meth:`generate`."""
        H = self.image_size

        @jax.jit
        def splat_memory(mem_pts, mem_valid, pose, intrinsic):
            pts = G.transform_points(mem_pts, pose)
            depth, mask = G.points_to_depth(pts, mem_valid, intrinsic,
                                            image_size=(H, H))
            # occlusion filter + condition image in the same program
            # (eager reduce_window/stack/normalize would pay ~28 ms of
            # tunnel dispatch per primitive per sample step)
            depth, mask = G.occlusion_filter(depth, mask)
            img_cond = G.normalize_to_neg_one_to_one(
                jnp.stack([depth * 0.1, mask.astype(jnp.float32)], axis=-1))
            return depth, img_cond

        @jax.jit
        def save_downsample(mem_pts, mem_valid):
            # one jitted program (not eager vmap: primitive-by-primitive
            # dispatch costs ~28 ms each through the tunnel) for the final
            # scene-{sid}.ply voxel-0.025 clouds (sdd:2225-2236)
            # batched variant: ONE whole-batch range predicate (a vmapped
            # voxel_downsample would lower its internal cond to select and
            # run the scatter fallback alongside the scan path)
            return P.voxel_downsample_batched(mem_pts, mem_valid, 0.025)

        @jax.jit
        def update_memory(mem_pts, mem_valid, images, pose, intrinsic):
            new_pts, new_valid = G.depth_to_points(
                images[..., 0] * 10.0, intrinsic, clip=(0.5, 10.0))
            # to world: p' = R^T (p - t)
            rot = pose[:, :3, :3]
            t = pose[:, :3, 3]
            world = jnp.einsum("bji,bnj->bni", rot,
                               new_pts - t[:, None, :],
                               precision=jax.lax.Precision.HIGHEST)
            # bounded memory: deterministic nearest-to-origin keep + count
            # of dropped voxels (vs the reference's unbounded growth,
            # sdd:2660-2680); scatter-free fused update — 5.2x the lexsort
            # composition on chip (tools/profile_voxel_update.py)
            return P.memory_voxel_update(mem_pts, mem_valid, world,
                                         new_valid, voxel_size,
                                         memory_capacity)

        return splat_memory, save_downsample, update_memory

    # ------------------------------------------------------------------
    def generate(self, num_scenes: int, num_samples: int,
                 voxel_size: float = 0.005,
                 memory_capacity: int = 1 << 18) -> None:
        """Scene-memory successive generation (sdd:2099-2247): each step
        re-projects the accumulated memory cloud under a random pose."""
        key = jax.random.PRNGKey(self.seed)
        done = 0
        b_idx = 0

        fns = self._generate_fns.get((float(voxel_size), memory_capacity))
        if fns is None:
            fns = self._build_generate_fns(voxel_size, memory_capacity)
            self._generate_fns[(float(voxel_size), memory_capacity)] = fns
        splat_memory, save_downsample, update_memory = fns

        overview_rows = []  # plasma overview grid rows (sdd:2237-2246)
        while done < num_scenes:
            batch = min(self.batch_size, num_scenes - done)
            key, k_intr, k_s = jax.random.split(key, 3)
            intrinsic = self._random_intrinsics(k_intr, batch)
            intr_j = M.shard_batch(self.mesh, intrinsic)
            param_cond = G.param_vector(intr_j)

            images_j = self._sample_uncond_fn(self.ema_params, k_s,
                                              param_cond)
            images = np.asarray(images_j)

            mem_pts0, mem_valid0 = G.depth_to_points(
                images_j[..., 0] * 10.0, intr_j, clip=(0.5, 10.0))
            pad = memory_capacity - mem_pts0.shape[1]
            if pad >= 0:
                mem_pts = jnp.pad(mem_pts0, ((0, 0), (0, pad), (0, 0)))
                mem_valid = jnp.pad(mem_valid0, ((0, 0), (0, pad)))
            else:
                # seed frame larger than the memory (h*w > capacity, e.g.
                # a small --memory_capacity at 256^2): bound it with the
                # same deterministic nearest-to-origin policy the running
                # memory uses, instead of jnp.pad crashing on a negative
                # pad width deep inside generate()
                mem_pts, mem_valid, _ = P.keep_nearest(
                    mem_pts0, mem_valid0, memory_capacity)

            scene_rows = [[] for _ in range(batch)]
            for scene_idx in range(batch):
                sid = b_idx * self.batch_size + scene_idx
                img = images[scene_idx, ..., 0]
                scene_rows[scene_idx].append(save_triptych(
                    self.samples_folder / f"scene-{sid}-sample-0.png",
                    np.zeros_like(img), np.zeros_like(img), img,
                    cmap="plasma"))

            for sample_idx in range(1, num_samples):
                key, k_pose, k_s = jax.random.split(key, 3)
                pose = S.random_sample_transform(k_pose, intr_j,
                                                 self.image_size)
                depth_rpj, img_cond = splat_memory(mem_pts, mem_valid, pose,
                                                   intr_j)
                images_rpj = np.asarray(depth_rpj) * 0.1
                images_last = images
                images_j = self._sample_fn(self.ema_params, k_s, param_cond,
                                           img_cond)
                images = np.asarray(images_j)
                mem_pts, mem_valid, overflow = update_memory(
                    mem_pts, mem_valid, images_j, pose, intr_j)
                for scene_idx, dropped in enumerate(np.asarray(overflow)):
                    if dropped > 0:
                        sid = b_idx * self.batch_size + scene_idx
                        print(f"WARNING: scene {sid} memory overflow: "
                              f"dropped {int(dropped)} farthest voxels "
                              f"(capacity {memory_capacity})")

                for scene_idx in range(batch):
                    sid = b_idx * self.batch_size + scene_idx
                    scene_rows[scene_idx].append(save_triptych(
                        self.samples_folder /
                        f"scene-{sid}-sample-{sample_idx}.png",
                        images_last[scene_idx, ..., 0],
                        images_rpj[scene_idx], images[scene_idx, ..., 0],
                        cmap="plasma"))

            # final clouds: the reference contract `scene-{sid}.ply` at
            # voxel 0.025 (sdd:2225-2236) + the full-resolution memory as
            # a debug extra
            save_pts, save_valid = save_downsample(mem_pts, mem_valid)
            save_np, savev_np = np.asarray(save_pts), np.asarray(save_valid)
            mem_np = np.asarray(mem_pts)
            memv_np = np.asarray(mem_valid)
            for scene_idx in range(batch):
                sid = b_idx * self.batch_size + scene_idx
                plyio.write_ply(
                    self.samples_folder / f"scene-{sid}.ply",
                    save_np[scene_idx][savev_np[scene_idx]])
                plyio.write_ply(
                    self.samples_folder / f"scene-{sid}-memory.ply",
                    mem_np[scene_idx][memv_np[scene_idx]])

            overview_rows += [np.concatenate(r, axis=-1)
                              for r in scene_rows]
            done += batch
            b_idx += 1

        if overview_rows:
            _imsave(self.samples_folder / "overview.png",
                    np.concatenate(overview_rows, axis=0), "plasma")
