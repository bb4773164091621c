"""Mesh / sharding utilities (data-parallel over ICI, scene-range over DCN)."""

from pointreggpt_tpu.parallel.mesh import (
    batch_sharded,
    create_mesh,
    is_main_process,
    local_scene_range,
    maybe_initialize_distributed,
    replicate,
    replicated,
    shard_batch,
)

__all__ = [
    "create_mesh",
    "replicated",
    "batch_sharded",
    "shard_batch",
    "replicate",
    "is_main_process",
    "local_scene_range",
    "maybe_initialize_distributed",
]
