"""Trainers, EMA, checkpointing, metrics."""

from pointreggpt_tpu.train import checkpoint, ema, metrics
from pointreggpt_tpu.train.mask_trainer import MaskTester, MaskTrainer
from pointreggpt_tpu.train.trainer import Trainer, TrainState

__all__ = [
    "Trainer",
    "TrainState",
    "MaskTrainer",
    "MaskTester",
    "checkpoint",
    "ema",
    "metrics",
]
