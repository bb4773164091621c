"""gt.log overlap throughput probe at production cloud sizes.

Round-2 ledger recorded ~1 s/pair: per-pair dispatch, per-bucket recompiles
and re-downsampling the same clouds for every pair of a scene. Round 3
reads + downsamples each cloud once and scores all pairs in one batched
jitted call (generate/gt.py). This probe measures the END-TO-END
``generate_gt`` wall clock (PLY read + downsample + batched overlap + TSV
write) on synthetic fragment-sized scenes and prints pairs/s.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_gtlog.py
"""

import os
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/pointreggpt_xla"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from pointreggpt_tpu.core import plyio
from pointreggpt_tpu.generate.gt import generate_gt

NUM_SAMPLES = 8          # 28 pairs/scene
NUM_SCENES = 2
POINTS_PER_CLOUD = 45_000  # fragment PLY at voxel 0.025 inside the 3m bbox


def make_scene(scene_dir: Path, rng, num_samples: int) -> None:
    """Overlapping fragment-like clouds: a rough room surface per sample,
    shifted a little so overlaps land around 0.3-0.9."""
    scene_dir.mkdir(parents=True, exist_ok=True)
    base = rng.uniform([-1.5, -1.5, 0.5], [1.5, 1.5, 3.5],
                       (POINTS_PER_CLOUD, 3)).astype(np.float32)
    # squash onto a wavy surface so voxel downsampling keeps most points
    base[:, 2] = 2.0 + 0.5 * np.sin(base[:, 0] * 2) * np.cos(base[:, 1] * 2)
    base[:, 2] += rng.normal(0, 0.01, POINTS_PER_CLOUD)
    for i in range(num_samples):
        shift = np.array([0.08 * i, 0.05 * i, 0.0], np.float32)
        jitter = rng.normal(0, 0.004, base.shape).astype(np.float32)
        plyio.write_ply(scene_dir / f"sample-{i:06d}.cloud.ply",
                        base + shift + jitter)


def main() -> None:
    print("backend:", jax.default_backend())
    with tempfile.TemporaryDirectory() as tmp:
        root = Path(tmp) / "data"
        rng = np.random.default_rng(0)
        for s in range(NUM_SCENES):
            make_scene(root / f"scene-{s:06d}", rng, NUM_SAMPLES)

        # warm-up: compiles the voxel + batched-overlap programs
        t0 = time.time()
        generate_gt("probe", 0, 1, NUM_SAMPLES, root=str(root),
                    verbose=False)
        warm = time.time() - t0
        (root / "scene-000000/gt.log").unlink()

        # timed: all scenes, cold file cache is irrelevant (host tmpfs)
        t0 = time.time()
        generate_gt("probe", 0, NUM_SCENES, NUM_SAMPLES, root=str(root),
                    verbose=False)
        dt = time.time() - t0

        pairs = NUM_SCENES * NUM_SAMPLES * (NUM_SAMPLES - 1) // 2
        kept = sum(
            len((root / f"scene-{s:06d}/gt.log").read_text().splitlines())
            for s in range(NUM_SCENES))
        print(f"warm-up (1 scene incl. compile): {warm:.2f}s")
        print(f"{NUM_SCENES} scenes x {NUM_SAMPLES} samples "
              f"({POINTS_PER_CLOUD} pts/cloud): {pairs} pairs in {dt:.2f}s "
              f"= {pairs / dt:.1f} pairs/s ({kept} pairs kept)")


if __name__ == "__main__":
    main()
