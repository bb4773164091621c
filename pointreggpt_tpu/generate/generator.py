"""Generator: the production dataset factory (SURVEY.md §3.3).

Reference: Generator sdd:2250-2694. For each scene drawn from the 3DMatch
``train_info.pkl`` pair pool: read the real source depth frame, crop to the
bbox [-1.5,-1.5,0.5]..[1.5,1.5,3.5], seed the *scene memory* cloud; then for
each sample: random SE(3) pose -> z-buffer splat of the memory cloud ->
depth-correction mask #1 (threshold 0.99 zeroes penetrating pixels) ->
DDNM diffusion sampling -> depth-correction pass #2 -> write pose/image/
depth/PLY outputs and fold the new frame back into the memory at voxel
0.002.

TPU redesign vs the reference's host ping-pong (its main throughput limiter,
SURVEY.md §3.3): all scenes of a batch advance together through ONE jitted
device program per sample step (batched splat + MaskUNet + the whole DDNM
chain + memory voxel maintenance); the host only does PNG/PLY writes and the
resume probing. Scene-range sharding across hosts keeps the reference's
``-start/-stop`` contract.

Output contract (unchanged, consumed by the example dataloaders):
``scene-%06d/{camera-intrinsics.txt, sample-%06d.pose.txt,
sample-%06d.image.png, sample-%06d.depth.png, sample-%06d.cloud.ply}``.
"""

from __future__ import annotations

import os
import pickle
import shutil
from contextlib import nullcontext
from functools import lru_cache
from pathlib import Path
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from pointreggpt_tpu.core import geometry as G
from pointreggpt_tpu.core import imageio16, plyio
from pointreggpt_tpu.core import pointops as P
from pointreggpt_tpu.core import sampling as S
from pointreggpt_tpu.diffusion import GaussianDiffusion
from pointreggpt_tpu.models import bake
from pointreggpt_tpu.parallel import mesh as M
from pointreggpt_tpu.train import checkpoint as ckpt

BBOX_MIN = (-1.5, -1.5, 0.5)
BBOX_MAX = (1.5, 1.5, 3.5)


@lru_cache(maxsize=32)
def _voxel_jit(capacity: int, voxel: float):
    """One jitted voxel-downsample program per (padded size, voxel).

    Eager ``P.voxel_downsample`` dispatches each primitive separately —
    ~28 ms of tunnel round-trip each; one fused program is one dispatch
    (same pattern as generate/gt.py). ``capacity`` only keys the cache
    (shapes are baked into the traced program)."""

    @jax.jit
    def fn(pts, valid):
        return P.voxel_downsample(pts, valid, voxel)

    return fn


def _voxel_downsample_host(pts_np: np.ndarray, voxel: float) -> np.ndarray:
    """Voxel-downsample an arbitrary-length host cloud, compacted.

    Pads to power-of-two buckets so the device op sees a bounded set of
    static shapes (a fresh shape per fragment would recompile every scene).
    """
    n = pts_np.shape[0]
    m = max(4096, 1 << (n - 1).bit_length())
    pts = np.zeros((m, 3), np.float32)
    pts[:n] = pts_np
    pj, vj = _voxel_jit(m, float(voxel))(jnp.asarray(pts),
                                         jnp.asarray(np.arange(m) < n))
    return np.asarray(pj)[np.asarray(vj)]


class Generator:
    """Batched scene generator.

    Args:
        model: DiffusionUNet (apply bound into ``diffusion``).
        diffusion: the sampling process (250-step DDIM+DDNM in production).
        folder: 3DMatch-RGBD train root (scene dirs with camera-intrinsics).
        depth_correction_model: optional MaskUNet for artifact removal.
        memory_capacity: padded scene-memory size per scene.
        mesh: local device mesh; the scene batch is sharded over its
            ``data`` axis with params replicated, so ONE process drives all
            local chips (the reference reaches multi-GPU generation only by
            wrapping the Generator in Accelerate and launching one process
            per device, sdd:2267-2271 + barrier :2690 — redesigned here as
            mesh-DP; multi-HOST runs still shard the scene range via
            ``parallel.local_scene_range``). Batches not divisible by the
            device count fall back to replicated (single-chip) placement.
    """

    def __init__(self,
                 model,
                 diffusion: GaussianDiffusion,
                 folder: str,
                 *,
                 batch_size: int = 16,
                 results_folder: str = "./results",
                 samples_folder: str = "./samples",
                 depth_correction_model=None,
                 depth_correction_results: str = "./depth_correction_results",
                 train_info_path: str = "./dataset/indoor/metadata/train_info.pkl",
                 data_root: str = "./dataset/indoor/data",
                 memory_capacity: int = 1 << 18,
                 seed: int = 0,
                 mesh=None):
        self.mesh = mesh if mesh is not None else M.create_mesh()
        self.model = model
        self.diffusion = diffusion
        self.folder = folder
        self.batch_size = batch_size
        self.image_size = diffusion.image_size
        self.results_folder = Path(results_folder)
        self.samples_folder = Path(samples_folder)
        self.samples_folder.mkdir(parents=True, exist_ok=True)
        self.depth_correction_model = depth_correction_model
        self.depth_correction_results = Path(depth_correction_results)
        self.train_info_path = train_info_path
        self.data_root = data_root
        self.memory_capacity = memory_capacity
        self.seed = seed
        self.ema_params = None
        self.dc_params = None
        self._dc_stamp = None  # (mtime_ns, size) of the loaded model-best
        # jitted step programs cached per (has_refine_step, memory_voxel):
        # a FRESH jax.jit object re-loads its executable through the axon
        # tunnel on first dispatch (~60 s measured even with the persistent
        # compile cache warm), so generate() must reuse one wrapper across
        # calls rather than rebuild per call (tools/profile_pipeline.py)
        self._step_fns = {}
        self._device_params = None  # (ema, dc) baked + replicated once

    # ------------------------------------------------------------------
    def load(self, milestone) -> None:
        """Load the diffusion EMA checkpoint (sdd:2307-2324)."""
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
        self.ema_params = state["ema"]["params"]
        self._device_params = None
        if meta.get("version"):
            print(f"loading from version {meta['version']}")

    def _load_depth_correction(self) -> None:
        """Load depth-correction model-best (sdd:2339-2346).

        Cached across generate() calls (re-reading + re-replicating the
        params per call would pay the tunnel upload every time), but keyed
        on the checkpoint file's (mtime, size): a model-best.ckpt
        overwritten between calls — e.g. by a concurrent depth-correction
        training run — is picked up on the next generate().
        """
        if self.depth_correction_model is None:
            return
        path = self.depth_correction_results / "model-best.ckpt"
        st = path.stat()
        stamp = (st.st_mtime_ns, st.st_size)
        if self.dc_params is not None and self._dc_stamp == stamp:
            return
        dummy = self.depth_correction_model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, self.image_size, self.image_size, 1)))
        state, _ = ckpt.load_checkpoint(
            path,
            {"epoch": 0,
             "params": jax.tree_util.tree_map(np.asarray, dummy)})
        self.dc_params = state["params"]
        self._dc_stamp = stamp
        self._device_params = None

    # ------------------------------------------------------------------
    def _build_step_fn(self, has_refine_step: bool, memory_voxel: float):
        """One fused device program advancing a whole batch by one sample."""
        H = self.image_size
        diffusion = self.diffusion
        dc_model = self.depth_correction_model
        cap = self.memory_capacity

        def step(ema_params, dc_params, mem_pts, mem_valid, intrinsic,
                 param_cond, key):
            k_pose, k_sample = jax.random.split(key)
            b = mem_pts.shape[0]
            pose = S.random_sample_pose(k_pose, b)

            # splat the transformed memory cloud (batched; the reference
            # loops scenes on host here, sdd:2531-2547)
            pts = G.transform_points(mem_pts, pose)
            depth_rpj, mask_rpj = G.points_to_depth(
                pts, mem_valid, intrinsic, image_size=(H, H))
            images_raw = depth_rpj * 0.1  # meters -> [0,1] model units
            images_rpj = images_raw

            # depth correction #1 (sdd:2563-2567)
            if dc_model is not None:
                prob = dc_model.apply(dc_params, images_rpj[..., None])
                keep = prob[..., 0] > 0.99
                images_rpj = jnp.where(keep, images_rpj, 0.0)
                mask_rpj = mask_rpj & keep

            img_cond = G.normalize_to_neg_one_to_one(
                jnp.stack(
                    [images_rpj, mask_rpj.astype(jnp.float32)], axis=-1))

            images = diffusion.sample(
                ema_params, k_sample, param_cond=param_cond,
                img_cond=img_cond, has_refine_step=has_refine_step)

            # depth correction #2 (sdd:2578-2581)
            if dc_model is not None:
                prob2 = dc_model.apply(dc_params, images)
                images = jnp.where(prob2 > 0.99, images, 0.0)

            # back-project new frame to world: p' = R^T (p - t) (sdd:2627)
            new_pts, new_valid = G.depth_to_points(
                images[..., 0] * 10.0, intrinsic, clip=(0.5, 10.0))
            rot = pose[:, :3, :3]
            t = pose[:, :3, 3]
            world = jnp.einsum("bji,bnj->bni", rot, new_pts - t[:, None, :],
                               precision=jax.lax.Precision.HIGHEST)

            # fold into scene memory at the memory voxel (sdd:2660-2680);
            # scatter-free fused update — 0.287 s -> measured in
            # tools/profile_voxel_update.py (VERDICT r4 next #1)
            mem_pts_new, mem_valid_new, overflow = P.memory_voxel_update(
                mem_pts, mem_valid, world, new_valid, memory_voxel, cap)

            return (pose, images_raw, images_rpj, images, world, new_valid,
                    mem_pts_new, mem_valid_new, overflow)

        return jax.jit(step)

    # ------------------------------------------------------------------
    def _read_scene_record(self, rel_path: str):
        """Resolve a train_info fragment record to (depth01, intrinsic) —
        the shared resolver (data/datasets.py) also backs TestDataset."""
        from pointreggpt_tpu.data.datasets import resolve_frame_record

        return resolve_frame_record(self.data_root, self.folder, rel_path,
                                    self.image_size)

    def _scene_source(self, info_train: Dict, abs_scene_idx: int):
        """src/tgt swap by scene index (sdd:2396-2410)."""
        pool = len(info_train["src"])
        if (abs_scene_idx // pool) % 2 == 0:
            return info_train["src"][abs_scene_idx % pool]
        return info_train["tgt"][abs_scene_idx % pool]

    # ------------------------------------------------------------------
    def generate(self,
                 start_scene_index: int,
                 stop_scene_index: int,
                 num_samples: int,
                 *,
                 memory_voxel_size: float = 0.002,
                 save_voxel_size: float = 0.025,
                 has_refine_step: bool = True,
                 info_train: Optional[Dict] = None,
                 scene_indices: Optional[Sequence[int]] = None,
                 verbose: bool = True) -> None:
        """Generate scenes [start, stop) with ``num_samples`` frames each.

        Args:
            scene_indices: explicit scene indices overriding the contiguous
                [start, stop) range — multi-host runs pass each process's
                strided slice (``parallel.local_scene_range``) so hosts
                shard the range automatically instead of via manual
                -start/-stop bookkeeping (generate_dataset.py:16-29).
        """
        from pointreggpt_tpu.utils import profiling

        cap = self.memory_capacity
        self._load_depth_correction()
        assert self.ema_params is not None, "call load() first"

        # PRGPT_PROFILE=<dir> (SURVEY.md §5.1): stage wall-clock breakdown
        # printed at exit + a jax.profiler trace of two steady-state sample
        # steps. "dispatch" is async launch latency; "host_write" overlaps
        # the NEXT step's device compute by design (pipelined below), so a
        # healthy profile shows host_write ≈ free unless it exceeds the
        # chain time. Steps running UNDER the open trace are excluded from
        # the breakdown (the tracer serializes tunnel dispatch ~4x wall —
        # timing and tracing never share a window).
        prof_dir = profiling.profile_dir()
        timer = profiling.StageTimer() if prof_dir else None
        # trace sample step 2 only (step 0 pays the chain compile; each
        # step is a full 250-step DDNM chain, so one step is plenty)
        capture = (profiling.StepTraceCapture(prof_dir, start=1, stop=3)
                   if prof_dir else None)

        def stage(name):
            if timer is None or (capture is not None and capture.tracing):
                return nullcontext()
            return timer.stage(name)

        if info_train is None:
            with open(self.train_info_path, "rb") as f:
                info_train = pickle.load(f)

        step_key = (bool(has_refine_step), float(memory_voxel_size))
        step_fn = self._step_fns.get(step_key)
        if step_fn is None:
            step_fn = self._step_fns[step_key] = self._build_step_fn(
                has_refine_step, memory_voxel_size)
        # params replicated on every local chip; the scene batch is sharded
        # on the data axis below (mesh-DP generation). Replication is lazy
        # (a fully-resumed run — every chunk skipped — never pays the
        # ~150 MB param transfer) and cached across generate() calls
        # (invalidated by load()/_load_depth_correction()).

        def device_params():
            if self._device_params is None:
                ema_params = M.replicate(
                    self.mesh, bake.maybe_bake(self.ema_params,
                                               self.model.dtype))
                dc_params = None
                if self.dc_params is not None:
                    dc_params = M.replicate(
                        self.mesh,
                        bake.maybe_bake(
                            self.dc_params,
                            self.depth_correction_model.dtype))
                self._device_params = (ema_params, dc_params)
            return self._device_params

        # fold the process index so multi-host shards draw distinct poses
        key = jax.random.fold_in(
            jax.random.PRNGKey(self.seed + start_scene_index),
            jax.process_index())

        if scene_indices is None:
            scene_indices = list(range(start_scene_index, stop_scene_index))
        else:
            scene_indices = list(scene_indices)
        for chunk_start in range(0, len(scene_indices), self.batch_size):
            chunk = scene_indices[chunk_start:chunk_start + self.batch_size]
            batch = len(chunk)

            # resume: skip a fully-written chunk (sdd:2370-2381).
            # FIXED DIVERGENCE: the reference probes
            # sample-{num_samples//2}.cloud.ply (sdd:2372) but only ever
            # writes cloud indices 0 and 1 (the fragment PLY index is
            # hardcoded to 1, sdd:2654-2657), so its resume silently
            # re-generates everything for num_samples >= 4. Probe index 1
            # unconditionally: it is written at sample_idx ==
            # num_samples - 1 for EVERY num_samples >= 1, so it is the true
            # completion marker (index num_samples//2 = 0 would probe the
            # pre-generation seed cloud and skip crashed scenes).
            # EVERY chunk member is probed: a chunk whose LAST scene was
            # completed by a previous run with a different batch size /
            # scene range / process count can still hold never-generated
            # scenes — a last-scene-only probe would skip the chunk
            # wholesale and leave silent holes in the dataset. A partially
            # complete chunk is regenerated whole — already-done members
            # are overwritten with fresh (equally valid) samples, which
            # beats silently missing scenes; re-running an unchanged
            # config reproduces them bit-identically (same key stream).
            done = [
                (self.samples_folder /
                 "scene-{:0>6d}/sample-000001.cloud.ply".format(s)).is_file()
                for s in chunk
            ]
            if all(done):
                if verbose:
                    print("Skip completed scenes "
                          f"{chunk[0]:0>6d} - {chunk[-1]:0>6d}.")
                continue

            intrinsic = np.zeros((batch, 3, 3), np.float32)
            mem_pts = np.zeros((batch, cap, 3), np.float32)
            mem_valid = np.zeros((batch, cap), bool)
            fragment_clouds = [None] * batch
            fragment_poses = [None] * batch

            # --- per-scene host setup: real frame -> memory seed ---------
            with stage("scene_setup"):
                self._setup_chunk(chunk, info_train, intrinsic, mem_pts,
                                  mem_valid, save_voxel_size)

            # shard the scene batch over the local mesh (replicated
            # fallback when batch % device count != 0, e.g. a tail chunk)
            mem_pts_j, mem_valid_j, intr_j = M.shard_batch(
                self.mesh, (mem_pts, mem_valid, intrinsic))
            param_cond = G.param_vector(intr_j)

            # --- successive conditional generation ----------------------
            # Pipelined: step k+1 is dispatched (async) before step k's host
            # writes run, so PNG/PLY encoding overlaps device compute. The
            # carried memory cloud stays on device between steps.
            pending = None  # (sample_idx, device outputs of the prior step)
            for sample_idx in range(num_samples):
                key, sub = jax.random.split(key)
                ema_p, dc_p = device_params()
                with stage("dispatch"), profiling.annotate("generator_step"):
                    (pose, images_raw, images_rpj, images, world, world_valid,
                     mem_pts_j, mem_valid_j, overflow) = step_fn(
                         ema_p, dc_p, mem_pts_j, mem_valid_j,
                         intr_j, param_cond, sub)
                if pending is not None:
                    with stage("host_write"):
                        self._write_sample_outputs(
                            chunk, pending[0], num_samples, pending[1],
                            fragment_clouds, fragment_poses, save_voxel_size,
                            verbose)
                pending = (sample_idx, (pose, images_raw, images_rpj, images,
                                        world, world_valid, overflow))
                if capture is not None:
                    capture.tick()
            if pending is not None:
                with stage("host_write"):
                    self._write_sample_outputs(
                        chunk, pending[0], num_samples, pending[1],
                        fragment_clouds, fragment_poses, save_voxel_size,
                        verbose)
        if capture is not None:
            capture.close()
        if timer is not None:
            print(f"profile stages (trace in {prof_dir}):\n"
                  + timer.summary())

    # ------------------------------------------------------------------
    def _setup_chunk(self, chunk, info_train, intrinsic, mem_pts, mem_valid,
                     save_voxel_size) -> None:
        """Per-scene host setup for one chunk: real frame -> memory seed
        (+ camera-intrinsics.txt / sample 0 image / seed cloud PLY,
        sdd:2441-2500). Fills ``intrinsic``/``mem_pts``/``mem_valid``
        in place."""
        cap = self.memory_capacity
        for i, sid in enumerate(chunk):
            scene_dir = self.samples_folder / f"scene-{sid:0>6d}"
            if scene_dir.exists():
                shutil.rmtree(scene_dir, ignore_errors=True)
            scene_dir.mkdir(parents=True, exist_ok=True)

            rel = self._scene_source(info_train, sid)
            depth01, intr = self._read_scene_record(rel)
            intrinsic[i] = intr
            np.savetxt(scene_dir / "camera-intrinsics.txt", intr)

            # save the real frame image (sample 0)
            from PIL import Image
            Image.fromarray(imageio16.to_uint8_image(depth01)).save(
                scene_dir / "sample-000000.image.png")

            pc = G.point_cloud_np(depth01 * 10.0, intr, clip=(0.5, 10.0))
            inside = np.all((pc >= BBOX_MIN) & (pc <= BBOX_MAX), axis=-1)
            pc = pc[inside]
            n = min(pc.shape[0], cap)
            mem_pts[i, :n] = pc[:n]
            mem_valid[i, :n] = True

            # sample-000000.cloud.ply: crop + voxel 0.025 (sdd:2492-2500)
            pj, vj = _voxel_jit(cap, float(save_voxel_size))(
                jnp.asarray(mem_pts[i]), jnp.asarray(mem_valid[i]))
            plyio.write_ply(scene_dir / "sample-000000.cloud.ply",
                            np.asarray(pj)[np.asarray(vj)])

    # ------------------------------------------------------------------
    def _write_sample_outputs(self, chunk, sample_idx, num_samples, outs,
                              fragment_clouds, fragment_poses,
                              save_voxel_size, verbose) -> None:
        """Host side of one generation step (sdd:2586-2658)."""
        cap = self.memory_capacity
        (pose, images_raw, images_rpj, images, world, world_valid,
         overflow) = outs
        pose_np = np.asarray(pose)
        images_np = np.asarray(images)
        images_raw_np = np.asarray(images_raw)
        images_rpj_np = np.asarray(images_rpj)
        world_np = np.asarray(world)
        world_valid_np = np.asarray(world_valid)
        overflow_np = np.asarray(overflow)
        # scene memory is bounded (the reference's grows without
        # bound, sdd:2660-2680); on overflow the farthest-from-origin
        # voxels were dropped deterministically — surface it
        for i, dropped in enumerate(overflow_np):
            if dropped > 0:
                print(f"WARNING: scene {chunk[i]:0>6d} memory "
                      f"overflow: dropped {int(dropped)} "
                      f"farthest-from-origin voxels (capacity {cap})")

        for i, sid in enumerate(chunk):
            scene_dir = self.samples_folder / f"scene-{sid:0>6d}"
            out_idx = sample_idx + 1

            # pose (inverse, sdd:2593-2594)
            np.savetxt(scene_dir / f"sample-{out_idx:0>6d}.pose.txt",
                       np.linalg.inv(pose_np[i]))
            # debug snapshots: pre-correction splat (sdd:2554-2560)
            # and post-correction condition (sdd:2597-2602)
            from PIL import Image
            Image.fromarray(imageio16.to_uint8_image(
                images_raw_np[i])).save(
                    scene_dir / "reprojected.image.png")
            Image.fromarray(imageio16.to_uint8_image(
                images_rpj_np[i])).save(
                    scene_dir / "corrected.image.png")
            img01 = images_np[i, ..., 0]
            Image.fromarray(imageio16.to_uint8_image(img01)).save(
                scene_dir / f"sample-{out_idx:0>6d}.image.png")
            imageio16.write_depth_png(
                scene_dir / f"sample-{out_idx:0>6d}.depth.png", img01)

            # accumulate the fragment cloud in world frame
            # (clip 0.5..10 like the reference PLY path, sdd:2623)
            wp = world_np[i][world_valid_np[i]]
            if sample_idx == 0:
                fragment_clouds[i] = wp
                fragment_poses[i] = pose_np[i]
            else:
                fragment_clouds[i] = np.concatenate(
                    [fragment_clouds[i], wp], axis=0)

            if sample_idx == num_samples - 1:
                frag = fragment_clouds[i]
                fpose = fragment_poses[i]
                # to the first-sample camera frame, crop, voxel,
                # back to world (sdd:2640-2658)
                cam = frag @ fpose[:3, :3].T + fpose[:3, 3]
                inside = np.all(
                    (cam >= BBOX_MIN) & (cam <= BBOX_MAX), axis=-1)
                cam = cam[inside].astype(np.float32)
                if cam.shape[0]:
                    down = _voxel_downsample_host(cam, save_voxel_size)
                    inv = np.linalg.inv(fpose)
                    down = down @ inv[:3, :3].T + inv[:3, 3]
                else:
                    down = cam
                plyio.write_ply(
                    scene_dir / "sample-000001.cloud.ply", down)

        if verbose:
            print(f"scenes {chunk[0]}-{chunk[-1]}: "
                  f"{sample_idx + 1}/{num_samples}")
