"""Downstream mixture dataloader tests on a synthetic generated dataset."""

import numpy as np
import pytest

from pointreggpt_tpu.core import plyio
from pointreggpt_tpu.dataloaders import (
    MixtureDataset,
    MixturePairDataset,
    gaussian_sample_translation,
    uniform_sample_rotation,
)


@pytest.fixture
def generated_root(tmp_path):
    rng = np.random.default_rng(0)
    a = rng.uniform(0, 1, (800, 3)).astype(np.float32)
    b = a + [0.01, 0, 0]
    scene = tmp_path / "data/scene-000000"
    scene.mkdir(parents=True)
    plyio.write_ply(scene / "sample-000000.cloud.ply", a)
    plyio.write_ply(scene / "sample-000001.cloud.ply", b)
    meta = tmp_path / "metadata"
    meta.mkdir()
    (meta / "gt.log").write_text("scene-000000\t0\t1\t0.9000\t0.9000\n")
    return str(tmp_path)


class TestRandomPose:
    def test_rotation_is_orthonormal(self):
        rng = np.random.default_rng(1)
        for _ in range(5):
            r = uniform_sample_rotation(rng)
            np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-10)
            assert np.isclose(np.linalg.det(r), 1.0)

    def test_translation_gaussian(self):
        rng = np.random.default_rng(2)
        t = np.stack([gaussian_sample_translation(rng) for _ in range(500)])
        assert abs(t.mean()) < 0.2 and 0.7 < t.std() < 1.3


class TestMixtureDataset:
    def test_generated_pair_posing(self, generated_root):
        infos = {"src": [], "tgt": [], "rot": [], "trans": []}
        ds = MixtureDataset(infos, extra_root=generated_root,
                            overlap_radius=0.05, data_augmentation=False,
                            seed=0)
        assert len(ds) == 1
        item = ds[0]
        # the host repos' exact 10-tuple contract (mixture.py:152)
        assert len(item) == 10
        (src, tgt, sf, tf, rot, trans, corr,
         src_raw, tgt_raw, sample_w) = item
        assert src_raw is src and tgt_raw is tgt
        assert sample_w.shape == (1,) and float(sample_w[0]) == 1.0
        # stored pose must align src onto tgt within the overlap radius
        aligned = src @ rot.T + trans[:, 0]
        d = np.linalg.norm(aligned[corr[:, 0]] - tgt[corr[:, 1]], axis=1)
        assert corr.shape[0] > 0
        assert d.max() <= 0.05 + 1e-6
        assert sf.shape == (src.shape[0], 1)

    def test_augmentation_keeps_alignment(self, generated_root):
        infos = {"src": [], "tgt": [], "rot": [], "trans": []}
        ds = MixtureDataset(infos, extra_root=generated_root,
                            overlap_radius=0.05, data_augmentation=True,
                            augment_noise=0.0, seed=1)
        src, tgt, _, _, rot, trans, corr = ds[0][:7]
        aligned = src @ rot.T + trans[:, 0]
        d = np.linalg.norm(aligned[corr[:, 0]] - tgt[corr[:, 1]], axis=1)
        assert d.max() <= 0.05 + 1e-5

    def test_max_points_cap(self, generated_root):
        infos = {"src": [], "tgt": [], "rot": [], "trans": []}
        ds = MixtureDataset(infos, extra_root=generated_root,
                            overlap_radius=0.05, max_points=100, seed=2)
        src, tgt, *_ = ds[0]
        assert src.shape[0] == 100 and tgt.shape[0] == 100


class TestMixturePairDataset:
    def test_item_contract(self, generated_root):
        ds = MixturePairDataset(generated_root, return_corr_indices=True,
                                matching_radius=0.05, seed=0)
        assert len(ds) == 1
        item = ds[0]
        for k in ("ref_points", "src_points", "ref_feats", "src_feats",
                  "transform", "overlap", "scene_name", "corr_indices"):
            assert k in item
        assert item["transform"].shape == (4, 4)
        assert item["ref_feats"].shape == (item["ref_points"].shape[0], 1)
        assert item["overlap"] == 0.9

    def test_point_limit(self, generated_root):
        ds = MixturePairDataset(generated_root, point_limit=50)
        item = ds[0]
        assert item["ref_points"].shape[0] == 50

    def test_real_metadata_merge_and_threshold(self, generated_root):
        real = [
            {"scene_name": "r0", "frag_id0": 0, "frag_id1": 1,
             "overlap": 0.5, "pcd0": "a.ply", "pcd1": "b.ply"},
            {"scene_name": "r1", "frag_id0": 0, "frag_id1": 1,
             "overlap": 0.05, "pcd0": "c.ply", "pcd1": "d.ply"},
        ]
        ds = MixturePairDataset(generated_root, real_metadata=real,
                                overlap_threshold=0.1)
        # low-overlap real pair filtered; generated pair appended
        assert len(ds) == 2
        names = {m["scene_name"] for m in ds.metadata_list}
        assert names == {"r0", "scene-000000"}

    def test_cube_crop(self, generated_root):
        # two overlapping planes: crop keeps points near a shared center
        ds = MixturePairDataset(generated_root, seed=3)
        rng = np.random.default_rng(0)
        ref = rng.uniform(-4, 4, (600, 3))
        # src = ref plus jitter < 5 cm (guaranteed overlap points), shifted
        # tail far away (never overlap)
        src = np.concatenate(
            [ref[:300] + rng.uniform(-0.02, 0.02, (300, 3)),
             ref[300:] + 100.0], axis=0)
        ref_c, src_c = ds.cube_crop(ref, src, size=3.0)
        # crops are non-empty strict subsets inside a 3m cube diameter
        assert 0 < ref_c.shape[0] < ref.shape[0]
        assert 0 < src_c.shape[0] < src.shape[0]
        assert np.all(ref_c.max(0) - ref_c.min(0) <= 3.0 * np.sqrt(3) + 1e-6)
        # every kept point came from the original cloud
        assert all(np.any(np.all(np.isclose(ref, p), axis=1)) for p in ref_c[:5])

    def test_cube_crop_no_overlap_returns_inputs(self, generated_root):
        ds = MixturePairDataset(generated_root, seed=3)
        ref = np.zeros((10, 3))
        src = np.full((10, 3), 50.0)
        ref_c, src_c = ds.cube_crop(ref, src)
        assert ref_c is ref and src_c is src


class TestGeotransExtras:
    def test_rotated_mode_keeps_alignment(self, generated_root):
        ds = MixturePairDataset(generated_root, use_augmentation=True,
                                augmentation_noise=0.0, rotated=True,
                                return_corr_indices=True,
                                matching_radius=0.05, seed=5)
        item = ds[0]
        ref, src = item["ref_points"], item["src_points"]
        tf = item["transform"]
        corr = item["corr_indices"]
        assert corr.shape[0] > 0
        aligned = src @ tf[:3, :3].T + tf[:3, 3]
        # corr columns are (ref_idx, src_idx) — GeoTransformer's order
        d = np.linalg.norm(ref[corr[:, 0]] - aligned[corr[:, 1]], axis=1)
        assert d.max() <= 0.05 + 1e-5

    def test_aug_rotation_factor_scales_angles(self, generated_root):
        from pointreggpt_tpu.dataloaders.mixture import random_sample_rotation
        rng = np.random.default_rng(0)
        # large factor -> tiny euler angles -> rotation near identity
        r = random_sample_rotation(rng, rotation_factor=1e6)
        np.testing.assert_allclose(r, np.eye(3), atol=1e-5)

    def test_rotation_v2_orthonormal(self):
        from pointreggpt_tpu.dataloaders.mixture import (
            random_sample_rotation_v2)
        rng = np.random.default_rng(1)
        for _ in range(5):
            r = random_sample_rotation_v2(rng)
            np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-10)
            assert np.isclose(np.linalg.det(r), 1.0)

    def test_corr_indices_contiguous_for_torch(self, generated_root):
        """The host repo's collate calls torch.from_numpy, which rejects
        negative-stride views — the column flip must produce a fresh
        contiguous array."""
        ds = MixturePairDataset(generated_root, return_corr_indices=True,
                                matching_radius=0.05, seed=0)
        corr = ds[0]["corr_indices"]
        assert corr.flags["C_CONTIGUOUS"]
        import torch

        t = torch.from_numpy(corr)  # raises on negative strides
        assert t.shape == corr.shape
