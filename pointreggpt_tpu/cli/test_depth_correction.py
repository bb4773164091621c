"""Qualitative depth-correction eval on 3DMatch test reprojections.

Mirror of the reference entry point (test_depth_correction.py:1-24); every
config field is a declarative ``--flag``.
"""

import argparse
import pickle

from pointreggpt_tpu.cli import _env  # noqa: F401

from pointreggpt_tpu import config as C


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--resume", default=None, type=str,
                        help="checkpoint milestone to load (best/latest)")
    parser.add_argument("--data", default="/path/to/3DMatch-RGBD/test",
                        help="path to 3DMatch RGB-D test set")
    parser.add_argument("--info",
                        default="./dataset/indoor/metadata/3DMatch.pkl",
                        help="test pair metadata pickle")
    parser.add_argument("--limit", default=None, type=int,
                        help="cap the number of evaluated pairs")
    parser.add_argument("--image_size", default=256, type=int)
    parser.add_argument("--results_folder",
                        default="./depth_correction_results")
    parser.add_argument("--samples_folder",
                        default="./depth_correction_samples")
    C.add_dataclass_args(parser, C.MaskModelConfig)
    return parser


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)

    from pointreggpt_tpu.train import MaskTester

    with open(args.info, "rb") as f:
        info = pickle.load(f)

    model = C.build_mask_unet(C.from_args(args, C.MaskModelConfig))

    tester = MaskTester(
        model,
        args.data,
        info=info,
        image_size=args.image_size,
        results_folder=args.results_folder,
        samples_folder=args.samples_folder,
    )

    if args.resume is not None:
        tester.load(args.resume)
    tester.test(limit=args.limit)


if __name__ == "__main__":
    main()
