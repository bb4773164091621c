"""Utilities: PyTorch checkpoint bridge."""

from pointreggpt_tpu.utils import torch_port

__all__ = ["torch_port"]
