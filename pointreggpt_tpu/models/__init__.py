"""Flax models: diffusion denoiser + depth-correction mask U-Net."""

from pointreggpt_tpu.models.bake import bake_inference_params, maybe_bake
from pointreggpt_tpu.models.unet import DiffusionUNet, MaskUNet

__all__ = ["DiffusionUNet", "MaskUNet", "bake_inference_params",
           "maybe_bake"]
