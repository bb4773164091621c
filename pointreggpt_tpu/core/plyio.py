"""Minimal PLY point-cloud reader/writer (host-side, pure numpy).

Replaces ``o3d.io.write_point_cloud`` / ``read_point_cloud`` (sdd:2012, 2658;
generate_gt.py:140-141). Writes binary little-endian float PLY that any
standard reader (including Open3D in the downstream example dataloaders)
parses; reads ascii and binary_little_endian with float/double vertex
properties.

I/O-bound, not a kernel — intentionally host-side (SURVEY.md §2.1).
"""

from __future__ import annotations

import os
from typing import Union

import numpy as np

_DTYPES = {
    "float": np.float32,
    "float32": np.float32,
    "double": np.float64,
    "float64": np.float64,
    "uchar": np.uint8,
    "uint8": np.uint8,
    "char": np.int8,
    "int8": np.int8,
    "short": np.int16,
    "int16": np.int16,
    "ushort": np.uint16,
    "uint16": np.uint16,
    "int": np.int32,
    "int32": np.int32,
    "uint": np.uint32,
    "uint32": np.uint32,
}


def write_ply(path: Union[str, os.PathLike], points: np.ndarray,
              *, dtype: str = "float") -> None:
    """Write an (n, 3) point array as binary little-endian PLY.

    Args:
        points: (n, 3) xyz. NaN/inf rows are dropped.
        dtype: "float" (float32) or "double" per-coordinate storage.
    """
    points = np.asarray(points, dtype=np.float64)
    finite = np.all(np.isfinite(points), axis=-1)
    points = points[finite]
    np_dtype = _DTYPES[dtype]
    header = (
        "ply\n"
        "format binary_little_endian 1.0\n"
        f"element vertex {points.shape[0]}\n"
        f"property {dtype} x\n"
        f"property {dtype} y\n"
        f"property {dtype} z\n"
        "end_header\n"
    )
    body = np.ascontiguousarray(points.astype(np_dtype)).tobytes()
    with open(path, "wb") as f:
        f.write(header.encode("ascii"))
        f.write(body)


def read_ply(path: Union[str, os.PathLike]) -> np.ndarray:
    """Read vertex x/y/z from an ascii or binary_little_endian PLY.

    Extra vertex properties (normals, colors) are parsed past but ignored;
    trailing elements after vertex (e.g. a mesh export's face element, the
    standard MeshLab/Open3D layout) are ignored too. The vertex element
    must come FIRST — a preceding element would shift the body offset, so
    that layout is rejected loudly rather than read as garbage. CRLF
    headers (Windows writers) are accepted.

    Returns:
        (n, 3) float64 points.
    """
    with open(path, "rb") as f:
        data = f.read()

    end = data.find(b"end_header")
    if end < 0:
        raise ValueError(f"{path}: not a PLY file (no end_header)")
    body_start = data.find(b"\n", end)
    if body_start < 0:
        raise ValueError(f"{path}: truncated PLY header")
    header = data[:end].decode("ascii", errors="replace").splitlines()
    body = data[body_start + 1:]

    fmt = None
    n_vertex = 0
    props = []  # (name, dtype) in declaration order, vertex element only
    in_vertex = False
    elements = []  # declaration order of element names
    for line in header:
        tok = line.strip().split()
        if not tok:
            continue
        if tok[0] == "format":
            fmt = tok[1]
        elif tok[0] == "element":
            elements.append(tok[1])
            in_vertex = tok[1] == "vertex"
            if in_vertex:
                n_vertex = int(tok[2])
        elif tok[0] == "property" and in_vertex:
            if tok[1] == "list":
                raise ValueError(f"{path}: list property in vertex element")
            props.append((tok[2], _DTYPES[tok[1]]))

    if "vertex" not in elements:
        raise ValueError(f"{path}: no vertex element")
    if elements[0] != "vertex":
        # a preceding element shifts the body offset (and list-typed ones
        # have data-dependent sizes) — reading on would return garbage
        raise ValueError(
            f"{path}: vertex is not the first element ({elements}); "
            "unsupported layout")

    names = [p[0] for p in props]
    if not all(axis in names for axis in ("x", "y", "z")):
        raise ValueError(f"{path}: vertex element missing x/y/z")

    if fmt == "ascii":
        # slice to the vertex element's own values: trailing elements
        # (faces) share the body
        rows = body.decode("ascii").split()[:n_vertex * len(props)]
        arr = np.array(rows, dtype=np.float64).reshape(n_vertex, len(props))
        cols = [arr[:, names.index(a)] for a in ("x", "y", "z")]
        return np.stack(cols, axis=-1)
    if fmt == "binary_little_endian":
        rec = np.dtype([(name, np.dtype(dt).newbyteorder("<"))
                        for name, dt in props])
        arr = np.frombuffer(body, dtype=rec, count=n_vertex)
        return np.stack(
            [arr["x"], arr["y"], arr["z"]], axis=-1).astype(np.float64)
    raise ValueError(f"{path}: unsupported PLY format {fmt!r}")
