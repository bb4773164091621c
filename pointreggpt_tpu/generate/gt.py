"""gt.log generation: pairwise overlap ratios over generated PLY fragments.

Reference: generate_gt.py:1-195 — for every scene, every pair of sample
clouds: skip <1000 points, compute bidirectional overlap (voxel 0.025,
radius x1.5), keep pairs with max overlap >= 0.1 and no NaN, write the
per-scene TSV ``gt.log``, then concatenate into ``metadata/gt.log``.

The reference's per-point KD-tree Python loops (its hottest CPU path,
SURVEY.md §3.4) are replaced by device programs built on
:func:`pointreggpt_tpu.core.pointops.overlap_ratio`. Each scene's clouds
are read and voxel-downsampled ONCE (the reference re-reads and
re-downsamples both clouds for every ``combinations(num_samples, 2)`` pair,
generate_gt.py:75-76), compacted, then ALL pairs are scored in one batched
jitted call — padded to power-of-two capacity/pair buckets so XLA compiles
a handful of shapes, not one per cloud.
"""

from __future__ import annotations

import os
from functools import lru_cache
from itertools import combinations
from pathlib import Path
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pointreggpt_tpu.core import plyio
from pointreggpt_tpu.core import pointops as P

MIN_POINTS = 1000
MIN_OVERLAP = 0.1


@lru_cache(maxsize=8)
def _overlap_fn(capacity: int, voxel_size: float, overlap_factor: float):
    @jax.jit
    def fn(pc1, valid1, pc2, valid2):
        return P.overlap_ratio(pc1, valid1, pc2, valid2,
                               voxel_size=voxel_size,
                               overlap_factor=overlap_factor)

    return fn


@lru_cache(maxsize=8)
def _voxel_fn(capacity: int, voxel_size: float):
    @jax.jit
    def fn(pts, valid):
        return P.voxel_downsample(pts, valid, voxel_size)

    return fn


@lru_cache(maxsize=16)
def _pair_overlap_fn(capacity: int, pairs: int, voxel_size: float,
                     overlap_factor: float):
    """One jitted program scoring a whole batch of ALREADY-DOWNSAMPLED
    pairs: (p, cap, 3) stacks in, (p,)+(p,) overlap ratios out. Removes the
    per-pair dispatch/recompile and the per-pair re-downsampling that made
    the loop ~1 s/pair (round-2 ledger)."""

    @jax.jit
    def fn(src, srcv, tgt, tgtv):
        def one(s, sv, t, tv):
            return P.overlap_ratio(s, sv, t, tv, voxel_size=voxel_size,
                                   overlap_factor=overlap_factor,
                                   downsample=False)

        return jax.vmap(one)(src, srcv, tgt, tgtv)

    return fn


def _pad_to_bucket(points: np.ndarray, capacity: int):
    n = points.shape[0]
    out = np.zeros((capacity, 3), np.float32)
    out[:n] = points[:capacity]
    valid = np.zeros((capacity,), bool)
    valid[:min(n, capacity)] = True
    return jnp.asarray(out), jnp.asarray(valid)


def _bucket(n: int) -> int:
    """Round cloud size up to a power-of-two bucket (bounded compile count)."""
    cap = 1024
    while cap < n:
        cap *= 2
    return cap


def compute_overlap_ratio_np(
    pc1: np.ndarray,
    pc2: np.ndarray,
    *,
    voxel_size: float = 0.025,
    overlap_factor: float = 1.5,
) -> Tuple[float, float]:
    """Bidirectional overlap between two host clouds (device-accelerated).

    Reference: compute_overlap_ratio generate_gt.py:68-102.
    """
    cap = _bucket(max(pc1.shape[0], pc2.shape[0], 1))
    p1, v1 = _pad_to_bucket(pc1, cap)
    p2, v2 = _pad_to_bucket(pc2, cap)
    ov1, ov2 = _overlap_fn(cap, voxel_size, overlap_factor)(p1, v1, p2, v2)
    return float(ov1), float(ov2)


def generate_gt(dataset_name: str,
                start_scene_index: int,
                stop_scene_index: int,
                num_samples: int,
                *,
                root: Optional[str] = None,
                min_points: int = MIN_POINTS,
                min_overlap: float = MIN_OVERLAP,
                voxel_size: float = 0.025,
                overlap_factor: float = 1.5,
                verbose: bool = True) -> None:
    """Write per-scene gt.log files (TSV: scene, src, tgt, ov_src, ov_tgt).

    Skips scenes whose gt.log already exists (crash-resume idempotence,
    generate_gt.py:126-128).
    """
    root_path = Path(root or f"./{dataset_name}/data")

    for scene_idx in range(start_scene_index, stop_scene_index):
        scene_name = "scene-{:0>6d}".format(scene_idx)
        scene_path = root_path / scene_name
        gt_path = scene_path / "gt.log"

        if gt_path.exists():
            if verbose:
                print("scene gt log has existed, skip over it")
            continue

        # read + voxel-downsample each sample cloud ONCE (the reference
        # re-reads and re-downsamples both clouds for every pair of the
        # scene, generate_gt.py:75-76), then score every pair in one
        # batched device call.
        clouds = {}
        for idx in range(num_samples):
            ply_path = scene_path / "sample-{:0>6d}.cloud.ply".format(idx)
            if not ply_path.exists():
                continue
            pts = plyio.read_ply(ply_path).astype(np.float32)
            if pts.shape[0] < min_points:
                continue
            clouds[idx] = pts

        pair_list = [(s, t) for s, t in combinations(range(num_samples), 2)
                     if s in clouds and t in clouds]
        gt_infos: List[str] = []
        if pair_list:
            raw_cap = _bucket(max(c.shape[0] for c in clouds.values()))
            vfn = _voxel_fn(raw_cap, voxel_size)
            down = {}
            max_down = 1
            for idx, pts in clouds.items():
                p, v = _pad_to_bucket(pts, raw_cap)
                pj, vj = vfn(p, v)
                compact = np.asarray(pj)[np.asarray(vj)]
                down[idx] = compact
                max_down = max(max_down, compact.shape[0])

            # compact downsampled clouds into the (smaller) pair bucket:
            # the O(cap^2) distance tiles shrink accordingly
            cap = _bucket(max_down)
            n_pairs = len(pair_list)
            pair_cap = 1
            while pair_cap < n_pairs:
                pair_cap *= 2
            src = np.zeros((pair_cap, cap, 3), np.float32)
            srcv = np.zeros((pair_cap, cap), bool)
            tgt = np.zeros((pair_cap, cap, 3), np.float32)
            tgtv = np.zeros((pair_cap, cap), bool)
            for k, (s, t) in enumerate(pair_list):
                src[k, :down[s].shape[0]] = down[s]
                srcv[k, :down[s].shape[0]] = True
                tgt[k, :down[t].shape[0]] = down[t]
                tgtv[k, :down[t].shape[0]] = True

            ov1_all, ov2_all = _pair_overlap_fn(
                cap, pair_cap, voxel_size, overlap_factor)(
                    jnp.asarray(src), jnp.asarray(srcv), jnp.asarray(tgt),
                    jnp.asarray(tgtv))
            ov1_all = np.asarray(ov1_all)
            ov2_all = np.asarray(ov2_all)

            for k, (src_idx, tgt_idx) in enumerate(pair_list):
                ov_src, ov_tgt = float(ov1_all[k]), float(ov2_all[k])
                if verbose:
                    print(f"{scene_name} src:{src_idx:0>2d} "
                          f"tgt:{tgt_idx:0>2d} ov_src:{ov_src:.3f} "
                          f"ov_tgt:{ov_tgt:.3f}")
                if np.isnan(ov_src) or np.isnan(ov_tgt):
                    continue
                if ov_src < min_overlap and ov_tgt < min_overlap:
                    continue
                gt_infos.append("{}\t{}\t{}\t{:.4f}\t{:.4f}\n".format(
                    scene_name, src_idx, tgt_idx, ov_src, ov_tgt))

        gt_path.parent.mkdir(parents=True, exist_ok=True)
        with open(gt_path, "w") as f:
            f.writelines(gt_infos)


def gather_gt(dataset_name: str,
              start_index: int,
              stop_index: int,
              *,
              root: Optional[str] = None,
              metadata: Optional[str] = None) -> None:
    """Concatenate per-scene gt.log files into metadata/gt.log.

    Reference: gather_gt generate_gt.py:177-188 (without the shell ``cat``).
    """
    root_path = Path(root or f"./{dataset_name}/data")
    final_gt_path = Path(metadata or f"./{dataset_name}/metadata/gt.log")
    final_gt_path.parent.mkdir(parents=True, exist_ok=True)
    if final_gt_path.exists():
        os.remove(final_gt_path)

    with open(final_gt_path, "w") as out:
        for scene_idx in range(start_index, stop_index):
            scene_gt = root_path / "scene-{:0>6d}".format(scene_idx) / "gt.log"
            if scene_gt.exists():
                out.write(scene_gt.read_text())


def parse_gt_log(path) -> List[dict]:
    """Parse a gt.log TSV into record dicts (the example dataloaders'
    contract: mixture.py:72-78, geotrans/dataset.py:77-95)."""
    records = []
    with open(path, "r") as f:
        for line in f.readlines():
            if not line.strip():
                continue
            scene_name, src_idx, tgt_idx, ov_src, ov_tgt = line.split("\t")
            records.append({
                "scene_name": scene_name,
                "src_idx": int(src_idx),
                "tgt_idx": int(tgt_idx),
                "overlap_src": float(ov_src),
                "overlap_tgt": float(ov_tgt),
            })
    return records
