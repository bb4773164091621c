"""Compute gt.log overlap metadata for a generated dataset.

Mirror of the reference entry point (generate_gt.py:1-195), with the
KD-tree Python loops replaced by the tiled TPU pairwise-distance kernel.
All overlap constants (min points, min overlap, voxel, radius factor) are
declarative ``--flags``.
"""

import argparse

from pointreggpt_tpu.cli import _env  # noqa: F401

from pointreggpt_tpu import config as C


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--start_scene_index", "-start", default=0, type=int)
    parser.add_argument("--stop_scene_index", "-stop", default=1, type=int)
    parser.add_argument("--disable_tqdm", action="store_true",
                        help="silence per-pair progress prints (flag name "
                             "kept for reference CLI parity)")
    C.add_dataclass_args(parser, C.GtLogConfig)
    return parser


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)

    from pointreggpt_tpu.generate import gather_gt, generate_gt

    cfg = C.from_args(args, C.GtLogConfig)
    generate_gt(cfg.dataset_name, args.start_scene_index,
                args.stop_scene_index, cfg.num_samples,
                min_points=cfg.min_points, min_overlap=cfg.min_overlap,
                voxel_size=cfg.voxel_size, overlap_factor=cfg.overlap_factor,
                verbose=not args.disable_tqdm)
    gather_gt(cfg.dataset_name, args.start_scene_index,
              args.stop_scene_index)


if __name__ == "__main__":
    main()
