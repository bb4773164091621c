"""Diffusion process: schedules, losses, jitted DDIM/DDNM sampling."""

from pointreggpt_tpu.diffusion.gaussian import GaussianDiffusion
from pointreggpt_tpu.diffusion.schedules import (
    DiffusionTables,
    cosine_beta_schedule,
    ddim_time_pairs,
    linear_beta_schedule,
    make_tables,
    sigmoid_beta_schedule,
)

__all__ = [
    "GaussianDiffusion",
    "DiffusionTables",
    "make_tables",
    "linear_beta_schedule",
    "cosine_beta_schedule",
    "sigmoid_beta_schedule",
    "ddim_time_pairs",
]
