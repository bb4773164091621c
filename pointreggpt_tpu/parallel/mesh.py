"""Device mesh + sharding helpers: the distributed backend (SURVEY.md §2.4).

The reference's entire collective surface is HuggingFace Accelerate wrapping
torch DDP/NCCL: prepare / backward-allreduce / barrier / rank-0 gating /
split_batches. The TPU-native equivalent is declarative: one
``jax.sharding.Mesh`` over ICI, the global batch sharded on the ``data``
axis, params replicated — ``jax.jit`` inserts the gradient all-reduce
(psum over ICI) automatically. Multi-host DCN comes via
``jax.distributed.initialize`` (``maybe_initialize_distributed``), and the
Generator's scene-range sharding maps to per-process index ranges with no
inter-host traffic.

The mesh abstraction deliberately supports extra axes (tp/pp are unused by a
35M-param U-Net but must not be precluded; SURVEY.md §2.2).
"""

from __future__ import annotations

import os
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

Array = jax.Array


def maybe_initialize_distributed() -> None:
    """Initialize JAX multi-host (DCN) if a coordinator is configured.

    No-op for single-host runs (and when already initialized). The
    Accelerate-launch equivalent (reference README.md:120-130): a bare
    multi-host run sets ``JAX_COORDINATOR_ADDRESS`` plus
    ``JAX_NUM_PROCESSES`` / ``JAX_PROCESS_ID`` per process and every CLI
    joins the coordination service before touching devices. The values are
    passed to :func:`jax.distributed.initialize` explicitly — JAX's own
    auto-bootstrap only detects managed clusters (SLURM/OpenMPI/k8s/TPU
    pods), not plain env wiring. Call this before any device use.
    """
    if not os.environ.get("JAX_COORDINATOR_ADDRESS"):
        return
    if jax.distributed.is_initialized():
        return
    kwargs = {
        "coordinator_address": os.environ["JAX_COORDINATOR_ADDRESS"]}
    num_proc = os.environ.get("JAX_NUM_PROCESSES")
    proc_id = os.environ.get("JAX_PROCESS_ID")
    # both-or-neither: with only one set, jax.distributed.initialize would
    # fall back to cluster auto-detection for the other, which on plain env
    # wiring hangs or mis-assigns ranks instead of failing fast
    if bool(num_proc) != bool(proc_id):
        raise ValueError(
            "JAX_NUM_PROCESSES and JAX_PROCESS_ID must be set together "
            f"(got JAX_NUM_PROCESSES={num_proc!r}, "
            f"JAX_PROCESS_ID={proc_id!r}); set both explicitly or neither "
            "(managed clusters auto-detect both)")
    if num_proc:
        kwargs["num_processes"] = int(num_proc)
        kwargs["process_id"] = int(proc_id)
    jax.distributed.initialize(**kwargs)


def create_mesh(devices: Optional[Sequence[jax.Device]] = None,
                axis_names: Sequence[str] = ("data",)) -> Mesh:
    """Build a 1-D (or reshaped N-D) mesh over the available chips.

    Args:
        devices: defaults to ``jax.devices()``.
        axis_names: mesh axis names; first axis gets all devices unless more
            names are passed (then the device grid is reshaped evenly).
    """
    if devices is None:
        devices = jax.devices()
    devs = np.asarray(devices)
    if len(axis_names) == 1:
        grid = devs
    else:
        # balanced exact factorization: each leading axis takes the largest
        # divisor <= the even split, the last axis absorbs the rest; sorted
        # descending so the leading (data) axis gets the biggest factor —
        # 8 devices x ("data", "model") -> 4x2
        n = len(devs)
        shape = []
        remaining = n
        for i in range(len(axis_names) - 1):
            target = int(round(remaining ** (1 / (len(axis_names) - i))))
            d = max(k for k in range(1, target + 1) if remaining % k == 0)
            shape.append(d)
            remaining //= d
        shape.append(remaining)
        shape.sort(reverse=True)
        grid = devs.reshape(shape)
    return Mesh(grid, axis_names=tuple(axis_names))


def replicated(mesh: Mesh) -> NamedSharding:
    """Sharding for replicated values (params, EMA, opt state)."""
    return NamedSharding(mesh, P())


def batch_sharded(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Sharding for per-example data: leading dim split over the data axis."""
    return NamedSharding(mesh, P(axis))


def shard_batch(mesh: Mesh, tree: Any, axis: str = "data") -> Any:
    """Device-put a host batch with its leading dim split across the mesh.

    Equivalent of Accelerate's ``split_batches=True`` dataloader sharding
    (sdd:1601): the global batch divides across chips. Arrays whose leading
    dim does not divide the DATA axis (e.g. batch-1 validation) are
    replicated — the divisibility gate uses ``mesh.shape[axis]``, not the
    total device count, so a multi-axis mesh (say 4×2 data×model) still
    splits a batch of 4 over its data axis instead of silently replicating
    it 8 ways.
    """
    n = int(mesh.shape[axis])
    split = batch_sharded(mesh, axis)
    repl = replicated(mesh)

    def put(x):
        x = jnp.asarray(x)
        sharding = split if (x.ndim > 0 and x.shape[0] % n == 0) else repl
        return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(put, tree)


def replicate(mesh: Mesh, tree: Any) -> Any:
    """Device-put a host pytree replicated on every chip."""
    sharding = replicated(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(jnp.asarray(x), sharding), tree)


def is_main_process() -> bool:
    """Rank-0 gating for checkpoint/log writes (Accelerate's
    ``is_main_process``, sdd:1657)."""
    return jax.process_index() == 0


def local_scene_range(start: int, stop: int) -> range:
    """Shard a [start, stop) scene-index range across hosts.

    The reference shards scenes across processes manually via CLI -start/-stop
    (generate_dataset.py:16-29); here each JAX process takes a strided slice
    automatically.
    """
    return range(start + jax.process_index(), stop, jax.process_count())
