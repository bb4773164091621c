"""Qualitative successive sampling (quick 32-step DDIM config).

Mirror of the reference entry point (test_successive_ddnm_diffusion.py:1-45):
same model, sampling_timesteps 32 and eta 1.0 as defaults, every config
field exposed as a ``--flag``.
"""

import argparse

from pointreggpt_tpu.cli import _env  # noqa: F401

from pointreggpt_tpu import config as C

TEST_DIFFUSION = C.DiffusionConfig(sampling_timesteps=32,
                                   ddim_sampling_eta=1.0)


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--resume", default=None, type=str,
                        help="checkpoint milestone to load (required)")
    parser.add_argument("--num_scenes", default=4, type=int)
    parser.add_argument("--num_samples", default=4, type=int)
    parser.add_argument("--batch_size", default=4, type=int)
    parser.add_argument("--results_folder",
                        default="./successive_ddnm_diffusion_results")
    parser.add_argument("--samples_folder",
                        default="./successive_ddnm_diffusion_samples")
    C.add_dataclass_args(parser, C.ModelConfig)
    C.add_dataclass_args(parser, C.DiffusionConfig, defaults=TEST_DIFFUSION)
    return parser


def main(argv=None) -> None:
    parser = build_parser()
    args = parser.parse_args(argv)
    if args.resume is None:
        # fail fast with a clear message — load(None) would otherwise
        # surface as a FileNotFoundError on "model-None.ckpt" (the
        # reference CLI has the same trap, test_…_diffusion.py:5-8, 43)
        parser.error("--resume is required (checkpoint milestone to load)")

    from pointreggpt_tpu.generate import Tester

    model = C.build_diffusion_unet(C.from_args(args, C.ModelConfig))
    diffusion = C.build_diffusion(C.from_args(args, C.DiffusionConfig), model)

    tester = Tester(
        model,
        diffusion,
        batch_size=args.batch_size,
        results_folder=args.results_folder,
        samples_folder=args.samples_folder,
    )

    tester.load(args.resume)
    tester.sample(num_scenes=args.num_scenes, num_samples=args.num_samples)


if __name__ == "__main__":
    main()
