"""Logging, meters and mask-evaluation metrics.

Ports of the depth_correction observability stack (dc:55-130): rank-0 file/
console ``Logger``, ``AverageMeter``, and the device-side mask metrics
{MSE, MAE, SAE, mIoU, PAcc, FP} computed at a mask threshold (dc:1229-1275).
"""

from __future__ import annotations

import logging
import sys
from typing import Dict, Optional

import jax
import jax.numpy as jnp

Array = jax.Array


def create_logger(log_file: Optional[str] = None,
                  name: Optional[str] = None) -> logging.Logger:
    """File or console logger (reference: create_logger dc:55-73).

    The logger name defaults to the destination, so constructing a second
    Logger (e.g. a MaskTrainer beside a Trainer) clears and re-points only
    its OWN handlers — a single shared name would silently redirect the
    first logger's output to the last-constructed destination.
    """
    if name is None:
        name = ("pointreggpt.console" if log_file is None
                else f"pointreggpt.file.{log_file}")
    logger = logging.getLogger(name)
    logger.handlers.clear()
    logger.setLevel(logging.INFO)
    logger.propagate = False
    fmt = logging.Formatter("[%(asctime)s] [%(levelname).4s] %(message)s",
                            datefmt="%Y-%m-%d %H:%M:%S")
    if log_file is not None:
        handler: logging.Handler = logging.FileHandler(log_file)
    else:
        handler = logging.StreamHandler(sys.stdout)
    handler.setFormatter(fmt)
    logger.addHandler(handler)
    return logger


class Logger:
    """Rank-0-gated logger wrapper (reference: Logger dc:76-101)."""

    def __init__(self, log_file: Optional[str] = None, is_main: bool = True):
        self.logger = create_logger(log_file) if is_main else None

    def info(self, message: str) -> None:
        if self.logger is not None:
            self.logger.info(message)

    def warning(self, message: str) -> None:
        if self.logger is not None:
            self.logger.warning(message)

    def error(self, message: str) -> None:
        if self.logger is not None:
            self.logger.error(message)


class AverageMeter:
    """Running average meter (reference: dc:104-130)."""

    def __init__(self):
        self.reset()

    def reset(self) -> None:
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val: float, num: int = 1) -> None:
        self.val = float(val)
        self.sum += float(val) * num
        self.count += num
        self.avg = self.sum / self.count

    def __float__(self) -> float:
        return float(self.avg)


def mask_metrics(input_img: Array, label_img: Array, label_mask: Array,
                 output_prob: Array, *,
                 mask_threshold: float = 0.99) -> Dict[str, Array]:
    """Depth-correction validation metrics, fully on device.

    Reference: compute_metrics dc:1229-1275 — depth errors between the
    thresholded-output-masked input and the label-masked label, plus the
    2x2 confusion-matrix stats of the masks themselves.

    Args:
        input_img / label_img: (b, h, w, 1) depths in [0, 1].
        label_mask: (b, h, w, 1) float/bool ground-truth keep mask.
        output_prob: (b, h, w, 1) predicted keep probability.

    Returns:
        dict of scalar arrays {MSE, MAE, SAE, mIoU, PAcc, FP}.
    """
    out_mask = output_prob > mask_threshold
    lab_mask = label_mask > mask_threshold

    out_img = jnp.where(out_mask, input_img, 0.0)
    lab_img = jnp.where(lab_mask, label_img, 0.0)

    diff = lab_img - out_img
    mse = jnp.mean(diff**2)
    mae = jnp.mean(jnp.abs(diff))
    sae = jnp.sum(jnp.abs(diff))

    lab_f = lab_mask.reshape(-1).astype(jnp.int32)
    out_f = out_mask.reshape(-1).astype(jnp.int32)
    idx = 2 * lab_f + out_f
    counts = jnp.zeros((4,), jnp.float32).at[idx].add(1.0)
    matrix = counts.reshape(2, 2)
    intersection = jnp.diag(matrix)
    union = matrix.sum(axis=1) + matrix.sum(axis=0) - intersection
    iou = intersection / jnp.where(union > 0, union, jnp.nan)
    miou = jnp.nanmean(iou)
    pacc = intersection.sum() / matrix.sum()
    fp = matrix[0, 1]

    return {"MSE": mse, "MAE": mae, "SAE": sae, "mIoU": miou, "PAcc": pacc,
            "FP": fp}
