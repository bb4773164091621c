"""Pallas TPU kernels for the hot primitives, with XLA fallbacks."""

from pointreggpt_tpu.ops import attention

__all__ = ["attention"]
