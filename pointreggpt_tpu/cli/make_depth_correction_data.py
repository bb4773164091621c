"""Synthesize the depth-correction training dataset (input/label pairs).

The reference trains MaskUNet on ``dataset/depth_correction`` pairs listed
in ``metadata/{train,val}.json`` but ships neither the data nor the script
that builds it (the train.json blob is missing from its checkout,
SURVEY.md §2.3 "Metadata assets"). This tool closes that gap: for each
3DMatch train pair it re-projects the source frame into the target view
(producing the point-penetration artifacts MaskUNet learns to mask) and
writes

    data/{idx:06d}-input.depth.png   re-projected (artifact-bearing) depth
    data/{idx:06d}-label.depth.png   real target depth
    metadata/{train,val}.json        [{"input_path", "label_path"}, ...]

matching PairedDepthDataset's contract exactly (dc:910-951; the
|label - input| < 0.005 keep-mask is derived at load time).

Re-projection runs batched on device (core.geometry.reproject).
"""

import argparse
import json
import pickle
from pathlib import Path

from pointreggpt_tpu.cli import _env  # noqa: F401

import numpy as np

def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--data", default="/path/to/3DMatch-RGBD/train",
                        help="3DMatch RGB-D train root")
    parser.add_argument("--train_info",
                        default="./dataset/indoor/metadata/train_info.pkl")
    parser.add_argument("--data_root", default="./dataset/indoor/data",
                        help="fragment .info.txt root")
    parser.add_argument("--out", default="./dataset/depth_correction")
    parser.add_argument("--image_size", default=256, type=int)
    parser.add_argument("--num_pairs", default=2000, type=int)
    parser.add_argument("--val_fraction", default=0.05, type=float)
    parser.add_argument("--seed", default=0, type=int)
    return parser


def main(argv=None):
    args = build_parser().parse_args(argv)

    import jax.numpy as jnp

    from pointreggpt_tpu.core import imageio16
    from pointreggpt_tpu.core.geometry import reproject

    with open(args.train_info, "rb") as f:
        info = pickle.load(f)

    out = Path(args.out)
    (out / "data").mkdir(parents=True, exist_ok=True)
    (out / "metadata").mkdir(parents=True, exist_ok=True)

    rng = np.random.default_rng(args.seed)
    order = rng.permutation(len(info["src"]))[:args.num_pairs]

    def frame_record(rel_path):
        # the ONE shared .pth -> first-frame resolver (data/datasets.py):
        # a local re-implementation here would let the depth-correction
        # training data silently diverge from the Generator/TestDataset
        # frame resolution
        from pointreggpt_tpu.data.datasets import resolve_frame_record

        return resolve_frame_record(args.data_root, args.data, rel_path,
                                    args.image_size, with_pose=True)

    entries = []
    for n, idx in enumerate(order):
        try:
            src_depth, src_pose, intr = frame_record(info["src"][idx])
            tgt_depth, tgt_pose, _ = frame_record(info["tgt"][idx])
        except (OSError, ValueError) as e:
            print(f"pair {idx}: skipped ({e})")
            continue

        relative = (np.linalg.inv(tgt_pose) @ src_pose).astype(np.float32)
        depth_rpj, mask_rpj = reproject(
            jnp.asarray(src_depth[None] * 10.0), jnp.asarray(intr[None]),
            jnp.asarray(relative[None]))
        input01 = np.asarray(depth_rpj)[0] * 0.1
        input01 = np.where(np.asarray(mask_rpj)[0], input01, 0.0)

        name_in = f"{n:06d}-input.depth.png"
        name_lb = f"{n:06d}-label.depth.png"
        imageio16.write_depth_png(out / "data" / name_in, input01)
        imageio16.write_depth_png(out / "data" / name_lb, tgt_depth)
        entries.append({"input_path": name_in, "label_path": name_lb})
        if (n + 1) % 100 == 0:
            print(f"{n + 1}/{len(order)} pairs written")

    # a usable output needs at least one train AND one val pair: with < 2
    # entries (e.g. every pair hit the skip path above on a bad --data)
    # exiting 0 with an empty/one-sided split would only fail later, inside
    # the depth-correction Trainer's loader
    if len(entries) < 2:
        raise SystemExit(
            f"only {len(entries)} usable pair(s) out of {len(order)} "
            "sampled — need >= 2 for a train/val split; check --data / "
            "--data_root (skipped pairs are logged above)")
    n_val = min(len(entries) - 1,
                max(1, int(len(entries) * args.val_fraction)))
    with open(out / "metadata/val.json", "w") as f:
        json.dump(entries[:n_val], f)
    with open(out / "metadata/train.json", "w") as f:
        json.dump(entries[n_val:], f)
    print(f"wrote {len(entries) - n_val} train / {n_val} val pairs to {out}")


if __name__ == "__main__":
    main()
