"""Core geometry / point-cloud / host-I/O primitives (L0 of SURVEY.md §1)."""

from pointreggpt_tpu.core import geometry, imageio16, plyio, pointops, sampling

__all__ = ["geometry", "imageio16", "plyio", "pointops", "sampling"]
