"""Train the depth-correction mask U-Net.

Mirror of the reference entry point (train_depth_correction.py:1-30); every
config field is a declarative ``--flag``.
"""

import argparse

from pointreggpt_tpu.cli import _env  # noqa: F401

from pointreggpt_tpu import config as C
from pointreggpt_tpu.parallel import maybe_initialize_distributed


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--resume", default=None, type=str,
                        help="checkpoint milestone to load (best/latest)")
    C.add_dataclass_args(parser, C.MaskModelConfig)
    C.add_dataclass_args(parser, C.MaskTrainConfig)
    return parser


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    maybe_initialize_distributed()

    from pointreggpt_tpu.train import MaskTrainer

    model = C.build_mask_unet(C.from_args(args, C.MaskModelConfig))
    cfg = C.from_args(args, C.MaskTrainConfig)

    trainer = MaskTrainer(
        model,
        cfg.data,
        image_size=cfg.image_size,
        train_batch_size=cfg.train_batch_size,
        train_lr=cfg.train_lr,
        lr_gamma=cfg.lr_gamma,
        epochs=cfg.epochs,
        results_folder=cfg.results_folder,
        samples_folder=cfg.samples_folder,
        val_batch_size=cfg.val_batch_size,
        num_workers=cfg.num_workers or None,
        seed=cfg.seed,
    )

    if args.resume is not None:
        trainer.load(args.resume)
    trainer.train_and_eval()


if __name__ == "__main__":
    main()
