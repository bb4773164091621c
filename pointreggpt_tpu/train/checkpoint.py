"""Checkpointing: msgpack pytree snapshots with step metadata.

Replaces the reference's ``torch.save`` dict checkpoints
({step, model, opt, ema, scaler} -> ``model-{milestone}.pt``, sdd:1681-1717;
{epoch, model, opt, scheduler, loss_hist, metrics} with best/latest naming,
dc:1185-1227). Same milestone file naming, flax-msgpack payload.

Writes are atomic (tmp + rename) and rank-0-gated by callers.
"""

from __future__ import annotations

import json
import os
from pathlib import Path
from typing import Any, Dict, Optional, Union

import jax
import numpy as np
from flax import serialization


def _to_host(tree: Any) -> Any:
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(path: Union[str, os.PathLike], state: Dict[str, Any],
                    *, meta: Optional[Dict[str, Any]] = None) -> None:
    """Serialize a dict-of-pytrees checkpoint.

    Args:
        state: arbitrary pytree dict (params, opt_state, ema, counters...).
        meta: small JSON-able metadata stored alongside in the payload.
    """
    payload = {
        "state": serialization.to_state_dict(_to_host(state)),
        "meta": meta or {},
    }
    blob = serialization.msgpack_serialize(payload)
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    tmp = path.with_suffix(path.suffix + ".tmp")
    with open(tmp, "wb") as f:
        f.write(blob)
        # make the tmp+rename actually atomic-durable: without the fsync a
        # crash after os.replace can journal the rename while the data
        # blocks are still in page cache — replacing a GOOD checkpoint
        # with a zero-length one
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)
    try:
        dfd = os.open(path.parent, os.O_RDONLY)
        try:
            os.fsync(dfd)
        finally:
            os.close(dfd)
    except OSError:  # pragma: no cover - e.g. dir fsync unsupported (NFS)
        pass


def load_checkpoint(path: Union[str, os.PathLike],
                    target: Optional[Dict[str, Any]] = None):
    """Load a checkpoint.

    Args:
        target: optional pytree with the desired structure; if given, the
            stored state is poured into it (restoring namedtuples/custom
            nodes), else the raw nested dict is returned.

    Returns:
        (state, meta)
    """
    with open(path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    state = payload["state"]
    if target is not None:
        state = serialization.from_state_dict(target, state)
    return state, payload.get("meta", {})


def latest_milestone(results_folder: Union[str, os.PathLike],
                     prefix: str = "model-") -> Optional[str]:
    """Find the newest ``model-*.ckpt`` milestone name in a folder."""
    folder = Path(results_folder)
    if not folder.exists():
        return None
    best: Optional[str] = None
    best_mtime = -1.0
    for p in folder.glob(f"{prefix}*.ckpt"):
        m = p.stat().st_mtime
        if m > best_mtime:
            best_mtime = m
            best = p.stem[len(prefix):]
    return best
