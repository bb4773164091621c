"""Full-pipeline integration: every CLI entry point chained end-to-end.

Runs the reference's complete production workflow (README.md:88-152) through
the REAL CLI ``main(argv)`` functions on one synthetic 3DMatch-style tree,
at toy sizes on CPU:

    1. train_successive_ddnm_diffusion  -> diffusion checkpoint
    2. make_depth_correction_data       -> input/label pair dataset
    3. train_depth_correction           -> MaskUNet model-best
    4. test_successive_ddnm_diffusion   -> qualitative triptychs/PLYs
    5. test_depth_correction            -> before/after GIFs
    6. generate_dataset                 -> generated scenes (PLY/PNG/pose)
    7. generate_gt                      -> per-scene + gathered gt.log
    8. dataloaders.MixtureDataset       -> downstream consumption

Each stage consumes the previous stage's on-disk outputs through the CLIs'
*default relative paths* (the working-directory contract the reference
documents in README.md), so this also pins that the six commands compose
without manual path surgery.
"""

import json
import os
import pickle
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent
CLI_DIR = str(REPO / "cli")
TESTS_DIR = str(REPO / "tests")

TINY_MODEL = ["--dim", "8", "--dim_mults", "1,2"]
TINY_DIFFUSION = ["--image_size", "32", "--timesteps", "16",
                  "--sampling_timesteps", "4"]


@pytest.mark.slow
class TestFullPipelineCli:
    def test_all_commands_end_to_end(self, tmp_path, monkeypatch):
        monkeypatch.syspath_prepend(TESTS_DIR)
        monkeypatch.syspath_prepend(CLI_DIR)
        from test_generate import make_3dmatch_tree
        from test_train import make_diffusion_dataset

        # --- synthetic data trees ------------------------------------
        # diffusion training tree lives apart; everything else uses the
        # CLI defaults relative to the working directory
        diff_root, gt_log = make_diffusion_dataset(
            tmp_path / "diff", n_scenes=1, n_frames=8)
        monkeypatch.chdir(tmp_path)
        # 9 scenes: the depth-correction builder makes one pair per scene
        # and MaskTrainer's global batch is train_batch_size x 8 fake
        # devices, so the train split needs >= 8 pairs (+1 for val)
        rgbd, info = make_3dmatch_tree(tmp_path, n_scenes=9)
        meta = tmp_path / "dataset/indoor/metadata"
        meta.mkdir(parents=True, exist_ok=True)
        with open(meta / "train_info.pkl", "wb") as f:
            pickle.dump(info, f)
        with open(meta / "3DMatch.pkl", "wb") as f:
            pickle.dump(info, f)

        # --- 1. diffusion training ------------------------------------
        import train_successive_ddnm_diffusion as train_cli

        train_cli.main([
            *TINY_MODEL, *TINY_DIFFUSION,
            "--data", diff_root, "--gt_log", gt_log,
            "--train_batch_size", "8", "--gradient_accumulate_every", "1",
            "--train_num_steps", "2", "--save_and_sample_every", "2",
            "--num_samples", "4", "--ema_update_every", "1",
        ])
        results = tmp_path / "successive_ddnm_diffusion_results"
        # milestone floored to hundreds (sdd:1813): step 2 -> model-0
        assert (results / "model-0.ckpt").exists()
        assert (results / "sample-1.png").exists()

        # --- 2. depth-correction data builder -------------------------
        import make_depth_correction_data as mkdc_cli

        mkdc_cli.main(["--data", rgbd, "--image_size", "32",
                       "--num_pairs", "9", "--val_fraction", "0.12"])
        dc_meta = tmp_path / "dataset/depth_correction/metadata"
        train_entries = json.loads((dc_meta / "train.json").read_text())
        val_entries = json.loads((dc_meta / "val.json").read_text())
        assert len(train_entries) == 8 and len(val_entries) == 1
        for e in train_entries + val_entries:
            assert (tmp_path / "dataset/depth_correction/data" /
                    e["input_path"]).exists()
            assert (tmp_path / "dataset/depth_correction/data" /
                    e["label_path"]).exists()

        # --- 3. depth-correction training ------------------------------
        import train_depth_correction as dc_train_cli

        dc_train_cli.main(["--dim", "8", "--dim_mults", "1,2",
                           "--image_size", "32", "--epochs", "1",
                           "--train_batch_size", "1",
                           "--val_batch_size", "2"])
        dc_results = tmp_path / "depth_correction_results"
        assert (dc_results / "model-best.ckpt").exists()
        assert (dc_results / "model-latest.ckpt").exists()

        # --- 4. qualitative diffusion sampling -------------------------
        import test_successive_ddnm_diffusion as test_cli

        test_cli.main([*TINY_MODEL, *TINY_DIFFUSION,
                       "--resume", "0", "--num_scenes", "2",
                       "--num_samples", "2", "--batch_size", "2"])
        samples = tmp_path / "successive_ddnm_diffusion_samples"
        for sid in range(2):
            assert (samples / f"scene-{sid}-sample-0.png").exists()
            assert (samples / f"scene-{sid}-sample-0.ply").exists()
            assert (samples / f"scene-{sid}-sample-1.png").exists()
        assert (samples / "overview.png").exists()

        # --- 5. qualitative depth-correction eval ----------------------
        import test_depth_correction as dc_test_cli

        dc_test_cli.main(["--dim", "8", "--dim_mults", "1,2",
                          "--image_size", "32", "--resume", "best",
                          "--data", rgbd, "--limit", "1"])
        dc_samples = tmp_path / "depth_correction_samples"
        assert (dc_samples / "000000-input.gif").exists()
        assert (dc_samples / "000000-output.gif").exists()

        # --- make the one-epoch MaskUNet behave trained -----------------
        # Generation gates the DDNM conditioning on MaskUNet(depth) > 0.99
        # (sdd:2563-2567); an untrained sigmoid sits near 0.5, so the mask
        # is empty, nothing gets pinned, the untrained diffusion output
        # (~5 m) falls outside the 0.5-3.5 m crop bbox and the fragment
        # clouds come out EMPTY. Push the final-conv bias so the mask is
        # ~1 everywhere (what a converged model produces on clean pixels),
        # keeping every downstream stage on real data.
        from pointreggpt_tpu.train import checkpoint as ckpt_lib

        dc_best = dc_results / "model-best.ckpt"
        state, meta_d = ckpt_lib.load_checkpoint(dc_best)
        bias = np.asarray(state["params"]["params"]["final_conv"]["bias"])
        state["params"]["params"]["final_conv"]["bias"] = bias + 10.0
        ckpt_lib.save_checkpoint(dc_best, state, meta=meta_d)

        # --- 6. dataset generation -------------------------------------
        import generate_dataset as gen_cli

        gen_cli.main([*TINY_MODEL, *TINY_DIFFUSION,
                      "--resume", "0", "--data", rgbd,
                      "--dc_dim", "8", "--dc_dim_mults", "1,2",
                      "--batch_size", "2", "--num_samples", "2",
                      "-start", "0", "-stop", "2"])
        for sid in range(2):
            scene = tmp_path / f"generated_dataset/data/scene-{sid:06d}"
            assert (scene / "camera-intrinsics.txt").exists()
            assert (scene / "sample-000000.cloud.ply").exists()
            assert (scene / "sample-000001.cloud.ply").exists()
            assert (scene / "sample-000001.depth.png").exists()
            assert (scene / "sample-000001.pose.txt").exists()

        # --- 7. gt.log overlap metadata ---------------------------------
        import generate_gt as gt_cli

        gt_cli.main(["--num_samples", "2", "-start", "0", "-stop", "2",
                     "--min_points", "10", "--min_overlap", "0.01",
                     "--disable_tqdm"])
        gathered = tmp_path / "generated_dataset/metadata/gt.log"
        assert gathered.exists()
        rows = [ln.split("\t") for ln in
                gathered.read_text().strip().splitlines()]
        assert rows, "no generated pair passed the overlap filter"
        assert all(len(r) == 5 for r in rows)

        # --- 8. downstream consumption ----------------------------------
        from pointreggpt_tpu.dataloaders import MixtureDataset

        ds = MixtureDataset({"src": [], "tgt": [], "rot": [], "trans": []},
                            extra_root="./generated_dataset",
                            max_points=5000, seed=0)
        assert len(ds) == len(rows)
        item = ds[0]
        assert len(item) == 10  # the host repos' exact tuple contract
        src_pcd, tgt_pcd = item[0], item[1]
        assert src_pcd.shape[1] == 3 and tgt_pcd.shape[1] == 3
        corr = item[6]
        assert corr.ndim == 2 and corr.shape[1] == 2
