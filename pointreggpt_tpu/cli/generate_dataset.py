"""Generate the synthetic registration dataset (production path).

Mirror of the reference entry point (generate_dataset.py:1-63): 250-step
DDIM+DDNM (eta 1.0), depth-correction MaskUNet, refine step off. Scene
sharding: single-host runs take the contiguous [-start, -stop) range;
multi-host runs (``jax.process_count() > 1``) automatically take each
process's strided slice of that range, replacing the reference's manual
per-process -start/-stop bookkeeping (generate_dataset.py:16-29).
"""

import argparse

from pointreggpt_tpu.cli import _env  # noqa: F401

from pointreggpt_tpu import config as C
from pointreggpt_tpu.parallel import maybe_initialize_distributed

GEN_DIFFUSION = C.DiffusionConfig(ddim_sampling_eta=1.0)


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--resume", default=None, type=str, required=True,
                        help="checkpoint milestone to load")
    parser.add_argument("--start_scene_index", "-start", default=0, type=int)
    parser.add_argument("--stop_scene_index", "-stop", default=1, type=int)
    C.add_dataclass_args(parser, C.ModelConfig)
    C.add_dataclass_args(parser, C.DiffusionConfig, defaults=GEN_DIFFUSION)
    C.add_dataclass_args(parser, C.GenerateConfig)
    # MaskUNet topology flags (shared dims with the diffusion net by default)
    C.add_dataclass_args(parser, C.MaskModelConfig, prefix="dc_")
    return parser


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    maybe_initialize_distributed()

    import jax

    from pointreggpt_tpu.generate import Generator
    from pointreggpt_tpu.parallel import local_scene_range

    model = C.build_diffusion_unet(C.from_args(args, C.ModelConfig))
    diffusion = C.build_diffusion(C.from_args(args, C.DiffusionConfig), model)
    depth_correction = C.build_mask_unet(
        C.from_args(args, C.MaskModelConfig, prefix="dc_"))
    cfg = C.from_args(args, C.GenerateConfig)

    generator = Generator(
        model,
        diffusion,
        cfg.data,
        batch_size=cfg.batch_size,
        results_folder=cfg.results_folder,
        samples_folder=f"./{cfg.dataset_name}/data",
        depth_correction_model=depth_correction,
        train_info_path=cfg.train_info_path,
        data_root=cfg.data_root,
        memory_capacity=cfg.memory_capacity,
        seed=cfg.seed,
    )

    scene_indices = None
    if jax.process_count() > 1:
        scene_indices = local_scene_range(args.start_scene_index,
                                          args.stop_scene_index)
        print(f"process {jax.process_index()}/{jax.process_count()}: "
              f"{len(scene_indices)} scenes of "
              f"[{args.start_scene_index}, {args.stop_scene_index})")

    generator.load(args.resume)
    generator.generate(
        start_scene_index=args.start_scene_index,
        stop_scene_index=args.stop_scene_index,
        num_samples=cfg.num_samples,
        memory_voxel_size=cfg.memory_voxel_size,
        save_voxel_size=cfg.save_voxel_size,
        has_refine_step=cfg.has_refine_step,
        scene_indices=scene_indices,
    )


if __name__ == "__main__":
    main()
