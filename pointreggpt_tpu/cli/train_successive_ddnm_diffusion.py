"""Train the successive-DDNM depth-inpainting diffusion model.

Mirror of the reference entry point (train_successive_ddnm_diffusion.py:1-47)
with the same hyperparameter defaults; every config field is a declarative
``--flag`` (the reference's edit-the-source paths and hard-coded constants,
README.md:96 — SURVEY.md §5.6).
"""

import argparse

from pointreggpt_tpu.cli import _env  # noqa: F401

from pointreggpt_tpu import config as C
from pointreggpt_tpu.parallel import maybe_initialize_distributed


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--resume", default=None, type=int,
                        help="checkpoint milestone to load")
    # bf16 compute, no remat: 16/chip at 256^2 fits v5e HBM and the
    # backward skips the recompute pass — 81.1 vs 69.3 img/s/chip measured
    # (remat stays available as --remat true for bigger per-chip batches).
    C.add_dataclass_args(parser, C.ModelConfig,
                         defaults=C.ModelConfig(remat=False))
    C.add_dataclass_args(parser, C.DiffusionConfig)
    C.add_dataclass_args(parser, C.TrainConfig)
    return parser


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    maybe_initialize_distributed()

    from pointreggpt_tpu.train import Trainer

    model = C.build_diffusion_unet(C.from_args(args, C.ModelConfig))
    diffusion = C.build_diffusion(C.from_args(args, C.DiffusionConfig), model)
    cfg = C.from_args(args, C.TrainConfig)

    trainer = Trainer(
        model,
        diffusion,
        cfg.data,
        train_batch_size=cfg.train_batch_size,
        train_lr=cfg.train_lr,
        train_num_steps=cfg.train_num_steps,
        gradient_accumulate_every=cfg.gradient_accumulate_every,
        augment_horizontal_flip=cfg.augment_horizontal_flip,
        ema_decay=cfg.ema_decay,
        ema_update_every=cfg.ema_update_every,
        save_and_sample_every=cfg.save_and_sample_every,
        num_samples=cfg.num_samples,
        results_folder=cfg.results_folder,
        samples_folder=cfg.samples_folder,
        gt_log=cfg.gt_log,
        calculate_fid=cfg.calculate_fid,
        num_workers=cfg.num_workers or None,
        seed=cfg.seed,
    )

    if args.resume is not None:
        trainer.load(args.resume)
    trainer.train()


if __name__ == "__main__":
    main()
