"""Dataclass config layer with CLI overrides (SURVEY.md §5.6).

The reference hard-codes every hyperparameter inside six entry scripts and
instructs users to edit source paths (README.md:96,110,152). Here each
pipeline gets a frozen dataclass capturing the reference's exact defaults;
``add_dataclass_args`` / ``from_args`` expose every field as a ``--flag`` so
the same entry commands work with declarative overrides.
"""

from __future__ import annotations

import argparse
import dataclasses
from dataclasses import dataclass, field, fields
from typing import Optional, Sequence, Tuple, Type, TypeVar

T = TypeVar("T")


@dataclass(frozen=True)
class ModelConfig:
    """DiffusionUNet hyperparameters (train_successive_ddnm_diffusion.py:12)."""

    dim: int = 64
    param_cond_dim: int = 4
    dim_mults: Tuple[int, ...] = (1, 2, 4, 8)
    channels: int = 1
    resnet_block_groups: int = 8
    # dormant reference surface (sdd:811-815): off in every entry script
    learned_variance: bool = False
    learned_sinusoidal_cond: bool = False
    random_fourier_features: bool = False
    learned_sinusoidal_dim: int = 16
    bf16: bool = True  # TPU MXU compute dtype
    remat: bool = False  # ResnetBlock rematerialization (training memory)


@dataclass(frozen=True)
class MaskModelConfig:
    """MaskUNet hyperparameters (train_depth_correction.py:12)."""

    dim: int = 64
    dim_mults: Tuple[int, ...] = (1, 2, 4, 8)
    resnet_block_groups: int = 8
    bf16: bool = False  # fp32 default: mask thresholding at 0.99 is tight


@dataclass(frozen=True)
class DiffusionConfig:
    """GaussianDiffusion hyperparameters (train script :14-24)."""

    image_size: int = 256
    timesteps: int = 1000
    sampling_timesteps: int = 250
    loss_type: str = "l1"
    objective: str = "pred_x0"
    beta_schedule: str = "sigmoid"
    ddim_sampling_eta: float = 0.0
    is_ddnm_sampling: bool = True
    ddnm_sampling_dropout: float = 0.0
    ddnm_dropout_schedule: str = "none"


@dataclass(frozen=True)
class TrainConfig:
    """Diffusion Trainer hyperparameters (train script :26-42)."""

    data: str = "/path/to/3DMatch-RGBD/train"
    gt_log: str = "./dataset/3DMatch/metadata/gt.log"
    train_batch_size: int = 32
    train_lr: float = 8e-5
    train_num_steps: int = 2_000_000
    gradient_accumulate_every: int = 2
    augment_horizontal_flip: bool = True
    ema_decay: float = 0.995
    ema_update_every: int = 10
    save_and_sample_every: int = 1000
    num_samples: int = 25
    results_folder: str = "./successive_ddnm_diffusion_results"
    samples_folder: str = "./successive_ddnm_diffusion_samples"
    calculate_fid: bool = False
    # 0 = auto (os.cpu_count()), matching the reference's
    # DataLoader(num_workers=cpu_count()) (sdd:1639-1644)
    num_workers: int = 0
    seed: int = 0


@dataclass(frozen=True)
class MaskTrainConfig:
    """Depth-correction trainer hyperparameters (train_depth_correction.py)."""

    data: str = "./dataset/depth_correction"
    image_size: int = 256
    train_batch_size: int = 4
    train_lr: float = 4e-5
    lr_gamma: float = 0.95
    epochs: int = 100
    # batched validation (the reference evaluates item-by-item, dc:1347);
    # per-item metrics are computed on device and averaged identically
    val_batch_size: int = 8
    results_folder: str = "./depth_correction_results"
    samples_folder: str = "./depth_correction_samples"
    num_workers: int = 0  # 0 = auto (os.cpu_count()), dc:1132
    seed: int = 0


@dataclass(frozen=True)
class GenerateConfig:
    """Generator hyperparameters (generate_dataset.py)."""

    data: str = "/path/to/3DMatch-RGBD/train"
    dataset_name: str = "generated_dataset"
    # 8 scenes/batch is the profiled v5e sweet spot (the reference used 4
    # for one GPU)
    batch_size: int = 8
    num_samples: int = 1
    memory_voxel_size: float = 0.002
    save_voxel_size: float = 0.025
    has_refine_step: bool = False
    memory_capacity: int = 1 << 18
    train_info_path: str = "./dataset/indoor/metadata/train_info.pkl"
    data_root: str = "./dataset/indoor/data"
    results_folder: str = "./successive_ddnm_diffusion_results"
    seed: int = 0


@dataclass(frozen=True)
class GtLogConfig:
    """gt.log overlap-metadata constants (generate_gt.py:68-155)."""

    dataset_name: str = "generated_dataset"
    num_samples: int = 2
    min_points: int = 1000
    min_overlap: float = 0.1
    voxel_size: float = 0.025
    overlap_factor: float = 1.5


def _parse_bool(s: str) -> bool:
    """Strict boolean flag vocabulary — an unrecognized value (a typo like
    'Ture', or 'y') must be an argparse error, not a silent False that
    disables e.g. augmentation for an entire multi-day run."""
    v = s.lower()
    if v in ("1", "true", "yes"):
        return True
    if v in ("0", "false", "no"):
        return False
    raise argparse.ArgumentTypeError(
        f"expected one of 1/0/true/false/yes/no, got {s!r}")


def add_dataclass_args(parser: argparse.ArgumentParser, cls: Type[T],
                       prefix: str = "",
                       defaults: Optional[T] = None) -> None:
    """Register every dataclass field as an argparse flag.

    Args:
        defaults: an instance whose values override the class defaults
            (e.g. the test CLI shares DiffusionConfig with sampling 32,
            eta 1.0 as its entry-script defaults).
    """
    base = defaults if defaults is not None else cls()
    for f in fields(cls):
        name = f"--{prefix}{f.name}"
        default = getattr(base, f.name)
        if isinstance(default, bool):
            parser.add_argument(name, type=_parse_bool, default=default)
        elif isinstance(default, tuple):
            parser.add_argument(
                name, type=lambda s: tuple(int(x) for x in s.split(",")),
                default=default)
        else:
            parser.add_argument(name, type=type(default), default=default)


def from_args(args: argparse.Namespace, cls: Type[T],
              prefix: str = "") -> T:
    """Build a dataclass from parsed argparse values."""
    kwargs = {}
    for f in fields(cls):
        kwargs[f.name] = getattr(args, f"{prefix}{f.name}")
    return cls(**kwargs)


# ---------------------------------------------------------------------------
# Factories: one place turning configs into live objects, shared by the CLIs
# ---------------------------------------------------------------------------


def build_diffusion_unet(cfg: ModelConfig):
    """ModelConfig -> DiffusionUNet."""
    import jax.numpy as jnp

    from pointreggpt_tpu.models import DiffusionUNet

    return DiffusionUNet(
        dim=cfg.dim, param_cond_dim=cfg.param_cond_dim,
        dim_mults=cfg.dim_mults, channels=cfg.channels,
        resnet_block_groups=cfg.resnet_block_groups,
        learned_variance=cfg.learned_variance,
        learned_sinusoidal_cond=cfg.learned_sinusoidal_cond,
        random_fourier_features=cfg.random_fourier_features,
        learned_sinusoidal_dim=cfg.learned_sinusoidal_dim,
        dtype=jnp.bfloat16 if cfg.bf16 else jnp.float32,
        remat=cfg.remat)


def build_mask_unet(cfg: MaskModelConfig):
    """MaskModelConfig -> MaskUNet."""
    import jax.numpy as jnp

    from pointreggpt_tpu.models import MaskUNet

    return MaskUNet(
        dim=cfg.dim, dim_mults=cfg.dim_mults,
        resnet_block_groups=cfg.resnet_block_groups,
        dtype=jnp.bfloat16 if cfg.bf16 else jnp.float32)


def build_diffusion(cfg: DiffusionConfig, model):
    """DiffusionConfig + model -> GaussianDiffusion.

    Mirrors the reference's construction-time guards (sdd:1032-1034):
    GaussianDiffusion requires model out channels == in channels (a
    ``learned_variance`` 2x head would silently broadcast against the
    1-channel target in p_losses) and rejects the Fourier/learned time
    embeddings (wired on the Unet for parity, unsupported by this wrapper).
    """
    from pointreggpt_tpu.diffusion import GaussianDiffusion

    if getattr(model, "learned_variance", False):
        raise ValueError(
            "GaussianDiffusion requires model.channels == out channels; "
            "learned_variance=True doubles the output head (reference "
            "asserts this away at construction, sdd:1032-1033)")
    if getattr(model, "learned_sinusoidal_cond", False) or \
            getattr(model, "random_fourier_features", False):
        raise ValueError(
            "GaussianDiffusion does not support random/learned sinusoidal "
            "time embeddings (reference assert, sdd:1034)")
    return GaussianDiffusion(
        apply_fn=lambda p, x, t, pc: model.apply(p, x, t, pc),
        image_size=cfg.image_size,
        timesteps=cfg.timesteps,
        sampling_timesteps=cfg.sampling_timesteps,
        loss_type=cfg.loss_type,
        objective=cfg.objective,
        beta_schedule=cfg.beta_schedule,
        ddim_sampling_eta=cfg.ddim_sampling_eta,
        is_ddnm_sampling=cfg.is_ddnm_sampling,
        ddnm_sampling_dropout=cfg.ddnm_sampling_dropout,
        ddnm_dropout_schedule=cfg.ddnm_dropout_schedule)
