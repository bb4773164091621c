"""Downstream mixture dataloaders (L8): real + generated registration pairs.

The reference ships drop-in torch Dataset classes for Predator / CoFiNet
(example_dataloader/{predator,cofinet}/mixture.py — near-identical) and
GeoTransformer (example_dataloader/geotrans/dataset.py) that extend those
repos' 3DMatch datasets with pairs parsed from the generated ``gt.log``.

This module provides the same behavior framework-side with no third-party
host repo required: numpy in, dict out. The heavy helpers those loaders pull
from their hosts (Open3D KD-tree correspondences) are served by our tiled
device kernel (:func:`pointreggpt_tpu.core.pointops.correspondences_np`).

Pose convention for generated pairs (mixture.py:104-115): sample a
Haar-uniform rotation + Gaussian translation and apply the *inverse* to the
src cloud — ``src' = (src - t) @ R`` — so that ``src = src' @ R.T + t``
recovers it, i.e. the stored (rot, trans) aligns src' onto tgt.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Dict, List, Optional, Sequence

import numpy as np

from pointreggpt_tpu.core import plyio
from pointreggpt_tpu.core.pointops import correspondences_np
from pointreggpt_tpu.generate.gt import parse_gt_log


def uniform_sample_rotation(rng: np.random.Generator) -> np.ndarray:
    """Haar-uniform SO(3) rotation via QR (mixture.py:15-33)."""
    z = rng.standard_normal((3, 3))
    while np.linalg.matrix_rank(z) != 3:
        z = rng.standard_normal((3, 3))
    q, r = np.linalg.qr(z)
    d = np.diag(r)
    q = q @ np.diag(d / np.abs(d))
    return q / np.linalg.det(q)


def gaussian_sample_translation(rng: np.random.Generator,
                                factor: float = 1.0) -> np.ndarray:
    """Gaussian translation (mixture.py:36-41)."""
    return rng.standard_normal(3) * factor


def random_sample_rotation(rng: np.random.Generator,
                           rotation_factor: float = 1.0) -> np.ndarray:
    """Scaled-Euler random rotation.

    The augmentation rotation both host repos use: GeoTransformer's
    ``utils.pointcloud.random_sample_rotation`` (imported by
    geotrans/dataset.py:13, called at :126) and the inline ``euler_ab``
    in predator/mixture.py:127-128 are the same
    ``Rotation.from_euler("zyx", rand(3) * 2pi / factor)`` draw.
    """
    euler = rng.random(3) * 2.0 * np.pi / rotation_factor
    from scipy.spatial.transform import Rotation

    return Rotation.from_euler("zyx", euler).as_matrix()


def random_sample_rotation_v2(rng: np.random.Generator) -> np.ndarray:
    """Random axis-angle-as-Euler rotation (GeoTransformer's
    ``random_sample_rotation_v2``, imported by geotrans/dataset.py:14 and
    used by its ``rotated`` mode :216-224; the helper lives in the host
    repo — reproduced from GeoTransformer's public utils: a random axis
    scaled by a random angle in [0, pi), interpreted as zyx Euler angles).
    """
    axis = rng.random(3) - 0.5
    # the host util adds the epsilon AFTER normalizing; kept verbatim
    axis = axis / np.linalg.norm(axis) + 1e-8
    theta = np.pi * rng.random()
    from scipy.spatial.transform import Rotation

    return Rotation.from_euler("zyx", axis * theta).as_matrix()


def load_point_cloud(file_path: str) -> np.ndarray:
    """PLY / .bin / .pth cloud loader (mixture.py:85-99)."""
    if file_path.endswith(".ply"):
        return plyio.read_ply(file_path)
    if file_path.endswith(".bin"):
        return np.fromfile(file_path, dtype=np.float32).reshape(-1, 4)[:, :3]
    if file_path.endswith(".pth"):
        import torch

        points = torch.load(file_path, weights_only=False)
        return points.numpy() if not isinstance(points, np.ndarray) else points
    raise AssertionError(f"Cannot recognize point cloud format: {file_path}")


def generated_pair_paths(extra_root: str) -> List[Dict]:
    """Parse gt.log into src/tgt PLY path records (mixture.py:71-78)."""
    records = []
    for rec in parse_gt_log(os.path.join(extra_root, "metadata", "gt.log")):
        scene_dir = os.path.join(extra_root, "data", rec["scene_name"])
        records.append({
            "scene_name": rec["scene_name"],
            "src_path": os.path.join(
                scene_dir, "sample-{:0>6d}.cloud.ply".format(rec["src_idx"])),
            "tgt_path": os.path.join(
                scene_dir, "sample-{:0>6d}.cloud.ply".format(rec["tgt_idx"])),
            "overlap": rec["overlap_src"],
            "frag_id0": rec["src_idx"],
            "frag_id1": rec["tgt_idx"],
        })
    return records


class MixtureDataset:
    """Predator/CoFiNet-style mixture: real 3DMatch pairs + generated pairs.

    Mirrors example_dataloader/predator/mixture.py:44-151. ``infos`` is the
    host repo's usual dict {"src": [...], "tgt": [...], "rot": [...],
    "trans": [...]}; generated pairs are appended from ``extra_root`` and
    posed with fresh Haar-uniform rotations at fetch time.

    Returns per item (the host repos' exact 10-tuple contract,
    mixture.py:152 — the augmented clouds repeated as the "raw" slots and a
    unit sample weight, ``np.ones(1)`` standing in for ``torch.ones(1)``):
        (src_pcd, tgt_pcd, src_feats, tgt_feats, rot, trans,
         correspondences, src_pcd, tgt_pcd, sample_weight)
    with correspondences as a (k, 2) int [src_idx, tgt_idx] array at
    ``overlap_radius`` (the Predator/CoFiNet ``get_correspondences`` column
    order). Clouds are float32 (the reference leaves Open3D's float64;
    both host repos cast downstream).
    """

    def __init__(self,
                 infos: Dict[str, list],
                 *,
                 base_dir: str = "",
                 extra_root: str,
                 overlap_radius: float = 0.0375,
                 data_augmentation: bool = True,
                 augment_noise: float = 0.005,
                 rot_factor: float = 1.0,
                 max_points: int = 30000,
                 seed: Optional[int] = None):
        self.infos = {k: list(v) for k, v in infos.items()}
        self.base_dir = base_dir
        self.overlap_radius = overlap_radius
        self.data_augmentation = data_augmentation
        self.augment_noise = augment_noise
        self.rot_factor = rot_factor
        self.max_points = max_points
        self.rng = np.random.default_rng(seed)

        self.num_real = len(self.infos.get("rot", []))
        for idx, info in enumerate(self.infos["src"]):
            self.infos["src"][idx] = os.path.join(base_dir, info)
        for idx, info in enumerate(self.infos["tgt"]):
            self.infos["tgt"][idx] = os.path.join(base_dir, info)

        for rec in generated_pair_paths(extra_root):
            self.infos["src"].append(rec["src_path"])
            self.infos["tgt"].append(rec["tgt_path"])

    def __len__(self) -> int:
        return len(self.infos["tgt"])

    def __getitem__(self, item: int):
        src_pcd = load_point_cloud(self.infos["src"][item]).astype(np.float64)
        tgt_pcd = load_point_cloud(self.infos["tgt"][item]).astype(np.float64)

        if item < self.num_real:
            rot = np.asarray(self.infos["rot"][item], np.float64)
            trans = np.asarray(self.infos["trans"][item], np.float64)
        else:
            rot = uniform_sample_rotation(self.rng)
            trans = gaussian_sample_translation(self.rng)
            src_pcd = (src_pcd - trans) @ rot  # inverse pose (mixture.py:114)

        if src_pcd.shape[0] > self.max_points:
            idx = self.rng.permutation(src_pcd.shape[0])[:self.max_points]
            src_pcd = src_pcd[idx]
        if tgt_pcd.shape[0] > self.max_points:
            idx = self.rng.permutation(tgt_pcd.shape[0])[:self.max_points]
            tgt_pcd = tgt_pcd[idx]

        if self.data_augmentation:
            # one-sided random euler rotation + uniform noise
            # (mixture.py:125-140)
            rot_ab = random_sample_rotation(self.rng, self.rot_factor)
            if self.rng.random() > 0.5:
                src_pcd = (rot_ab @ src_pcd.T).T
                rot = rot @ rot_ab.T
            else:
                tgt_pcd = (rot_ab @ tgt_pcd.T).T
                rot = rot_ab @ rot
                trans = rot_ab @ trans
            src_pcd += (self.rng.random(src_pcd.shape) - 0.5) * \
                self.augment_noise
            tgt_pcd += (self.rng.random(tgt_pcd.shape) - 0.5) * \
                self.augment_noise

        trans_col = trans.reshape(3, 1)
        tsfm = np.eye(4)
        tsfm[:3, :3] = rot
        tsfm[:3, 3] = trans_col[:, 0]
        correspondences = correspondences_np(src_pcd, tgt_pcd, tsfm,
                                             self.overlap_radius)

        src_feats = np.ones((src_pcd.shape[0], 1), np.float32)
        tgt_feats = np.ones((tgt_pcd.shape[0], 1), np.float32)
        src_out = src_pcd.astype(np.float32)
        tgt_out = tgt_pcd.astype(np.float32)
        return (src_out, tgt_out, src_feats, tgt_feats,
                rot.astype(np.float32), trans_col.astype(np.float32),
                correspondences, src_out, tgt_out,
                np.ones(1, np.float32))


class MixturePairDataset:
    """GeoTransformer-style mixture dataset.

    Mirrors example_dataloader/geotrans/dataset.py:21-244: merges the real
    ``train.pkl`` metadata with generated gt.log entries; per-item dict with
    ref/src points, unit features, the aligning transform, and optional
    correspondence indices.
    """

    def __init__(self,
                 dataset_root: str,
                 *,
                 real_metadata: Optional[Sequence[Dict]] = None,
                 real_data_root: str = "",
                 point_limit: Optional[int] = None,
                 use_augmentation: bool = False,
                 augmentation_noise: float = 0.005,
                 augmentation_rotation: float = 1.0,
                 overlap_threshold: Optional[float] = None,
                 return_corr_indices: bool = False,
                 matching_radius: Optional[float] = None,
                 rotated: bool = False,
                 seed: Optional[int] = None):
        self.dataset_root = dataset_root
        self.point_limit = point_limit
        self.use_augmentation = use_augmentation
        self.aug_noise = augmentation_noise
        self.aug_rotation = augmentation_rotation
        self.rotated = rotated
        self.return_corr_indices = return_corr_indices
        self.matching_radius = matching_radius
        if return_corr_indices and matching_radius is None:
            raise ValueError(
                '"matching_radius" is None but "return_corr_indices" is set.')
        self.rng = np.random.default_rng(seed)

        self.metadata_list: List[Dict] = []
        for meta in (real_metadata or []):
            if (overlap_threshold is not None
                    and meta["overlap"] <= overlap_threshold):
                continue
            m = dict(meta)
            m["pcd0"] = os.path.join(real_data_root, meta["pcd0"])
            m["pcd1"] = os.path.join(real_data_root, meta["pcd1"])
            self.metadata_list.append(m)

        for rec in generated_pair_paths(dataset_root):
            self.metadata_list.append({
                "scene_name": rec["scene_name"],
                "frag_id0": rec["frag_id0"],
                "frag_id1": rec["frag_id1"],
                "overlap": rec["overlap"],
                "pcd0": rec["src_path"],
                "pcd1": rec["tgt_path"],
            })

    def __len__(self) -> int:
        return len(self.metadata_list)

    def _load(self, path: str) -> np.ndarray:
        points = load_point_cloud(path)
        if self.point_limit is not None and points.shape[0] > self.point_limit:
            idx = self.rng.permutation(points.shape[0])[:self.point_limit]
            points = points[idx]
        return points

    def cube_crop(self, ref_points: np.ndarray, src_points: np.ndarray,
                  size: float = 3.0):
        """Random rotated-cube crop around a shared overlap point.

        Port of geotrans/dataset.py:142-184 (``_cube_crop`` — defined but
        never called in the reference's ``__getitem__`` either; kept for
        API parity and available to users who wire it in). Picks a random
        ref point with a src counterpart within 5 cm, then keeps the points
        of each cloud that fall inside an independently randomly-rotated
        axis-test cube of side ``size`` centered there. The cKDTree query
        is replaced by the tiled device distance kernel
        (:func:`pointreggpt_tpu.core.pointops.min_dist_sq`).
        """
        import jax.numpy as jnp

        from pointreggpt_tpu.core.pointops import min_dist_sq

        ref = np.asarray(ref_points, np.float64)
        src = np.asarray(src_points, np.float64)
        d2 = np.asarray(min_dist_sq(
            jnp.asarray(ref, jnp.float32),
            jnp.ones((ref.shape[0],), bool),
            jnp.asarray(src, jnp.float32),
            jnp.ones((src.shape[0],), bool)))
        ref_overlap = ref[d2 < 0.05 * 0.05]
        if ref_overlap.shape[0] == 0:
            return ref_points, src_points

        center = ref_overlap[self.rng.integers(ref_overlap.shape[0])]
        lo = center - size / 2
        hi = center + size / 2

        def crop(points):
            # rotate about the center with a fresh random rotation
            # (dataset.py:163,174 draw random_sample_rotation()), test the
            # axis-aligned cube, keep the ORIGINAL points (the cube is
            # effectively randomly oriented)
            rot = random_sample_rotation(self.rng)
            tmp = (points - center) @ rot.T + center
            mask = np.all((tmp > lo) & (tmp < hi), axis=1)
            return points[mask]

        return crop(ref_points), crop(src_points)

    def __getitem__(self, index: int) -> Dict:
        meta = self.metadata_list[index]
        ref_points = self._load(meta["pcd0"]).astype(np.float64)
        src_points = self._load(meta["pcd1"]).astype(np.float64)
        rotation = np.asarray(meta.get("rotation", np.eye(3)), np.float64)
        translation = np.asarray(meta.get("translation", np.zeros(3)),
                                 np.float64)

        if self.use_augmentation:
            # scaled-Euler rotation to one side + noise (dataset.py:117-140)
            aug_rot = random_sample_rotation(self.rng, self.aug_rotation)
            if self.rng.random() > 0.5:
                ref_points = ref_points @ aug_rot.T
                rotation = aug_rot @ rotation
                translation = aug_rot @ translation
            else:
                src_points = src_points @ aug_rot.T
                rotation = rotation @ aug_rot.T
            ref_points += (self.rng.random(ref_points.shape) - 0.5) * \
                self.aug_noise
            src_points += (self.rng.random(src_points.shape) - 0.5) * \
                self.aug_noise

        if self.rotated:
            # independent whole-cloud rotations (dataset.py:216-224)
            ref_rot = random_sample_rotation_v2(self.rng)
            ref_points = ref_points @ ref_rot.T
            rotation = ref_rot @ rotation
            translation = ref_rot @ translation
            src_rot = random_sample_rotation_v2(self.rng)
            src_points = src_points @ src_rot.T
            rotation = rotation @ src_rot.T

        transform = np.eye(4)
        transform[:3, :3] = rotation
        transform[:3, 3] = translation

        data_dict = {
            "scene_name": meta["scene_name"],
            "ref_frame": meta["frag_id0"],
            "src_frame": meta["frag_id1"],
            "overlap": meta["overlap"],
            "ref_points": ref_points.astype(np.float32),
            "src_points": src_points.astype(np.float32),
            "ref_feats": np.ones((ref_points.shape[0], 1), np.float32),
            "src_feats": np.ones((src_points.shape[0], 1), np.float32),
            "transform": transform.astype(np.float32),
            "index": index,
        }
        if self.return_corr_indices:
            # GeoTransformer's get_correspondences returns (ref_idx,
            # src_idx) columns (ref enumerated first); ours yields
            # [src_idx, ref_idx] — same pair set, flip the columns (row
            # order differs, downstream treats it as a set). The
            # ascontiguousarray copy is LOAD-BEARING: it removes the
            # [:, ::-1] negative stride, which the host repo's collate
            # (torch.from_numpy) rejects.
            data_dict["corr_indices"] = np.ascontiguousarray(
                correspondences_np(src_points, ref_points, transform,
                                   self.matching_radius)[:, ::-1])
        return data_dict
