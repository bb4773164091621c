"""ctypes bindings for the native C++ host runtime (csrc/*.cpp).

Builds the shared library on first use (g++ -O3) and exposes:

- :func:`depth_preprocess` — uint16 mm frame -> model-space float32 [0,1]
  (NEAREST short-side resize + center crop + scale/clip + optional flip);
  the training dataloader's host hot path.
- :func:`voxel_downsample_host` / :func:`radius_hits_host` — CPU fallbacks
  for the device point ops (used by gt tooling on accelerator-less hosts).
- :func:`ply_pack` — binary PLY byte packing.

All functions degrade gracefully: if the toolchain is unavailable the pure
Python/numpy paths keep working (``is_available()`` gates call sites).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path
from typing import Optional

import numpy as np

_SRC = Path(__file__).resolve().parent / "csrc"


def _source_tag() -> str:
    """Short content hash of the C++ source, used in the .so file name.

    Keying the binary by source hash (not mtime) means two installed
    package versions — or a downgrade, where pip-restored source mtimes
    can predate a cached build — never silently share one binary whose
    exported symbols may not match the bindings.
    """
    import hashlib

    cpp = _SRC / "pointreggpt_native.cpp"
    try:
        return hashlib.sha256(cpp.read_bytes()).hexdigest()[:12]
    except OSError:
        return "nosrc"


def _lib_path() -> Path:
    """Build target for the shared library.

    Next to the source when writable (repo checkouts); otherwise a user
    cache dir — a pip-installed site-packages tree is often read-only,
    and the wheel ships only the .cpp (built on first use, g++ -O3).
    The file name embeds a hash of the source, so a source change (or a
    different installed version sharing the cache dir) always triggers a
    fresh build instead of loading a stale binary.
    """
    name = f"_pointreggpt_native-{_source_tag()}.so"
    if os.access(_SRC, os.W_OK):
        return _SRC / name
    cache = Path(os.environ.get("XDG_CACHE_HOME",
                                os.path.expanduser("~/.cache")))
    out = cache / "pointreggpt_native"
    out.mkdir(parents=True, exist_ok=True)
    return out / name


_LIB_PATH = _lib_path()
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> bool:
    cpp = _SRC / "pointreggpt_native.cpp"
    if not cpp.exists():
        return False
    # compile to a process-unique tmp name, then atomically os.replace
    # into place: two processes racing the same missing _LIB_PATH would
    # otherwise have g++ truncate/rewrite the file one of them is about
    # to (or already did) dlopen. The dotted tmp name stays outside the
    # `_pointreggpt_native*.so` stale-cleanup glob so a concurrent
    # _load() cannot unlink a build in progress.
    tmp = _LIB_PATH.parent / f".build-{os.getpid()}-{_LIB_PATH.name}"
    base = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
            "-o", str(tmp), str(cpp)]
    # PNG decode needs zlib; on hosts without zlib dev headers retry
    # without it (png16_* become "unsupported" stubs and callers fall back
    # to PIL) rather than losing ALL native fast paths.
    for cmd in (base + ["-DPRGPT_HAVE_ZLIB", "-lz"], base):
        try:
            subprocess.run(cmd, check=True, capture_output=True,
                           timeout=300)
            os.replace(tmp, _LIB_PATH)
            if cmd is not base:
                return True
            import warnings

            warnings.warn(
                "pointreggpt_tpu.native: built without zlib — native PNG "
                "decode disabled, PIL fallback in use", RuntimeWarning)
            return True
        except Exception:
            continue
        finally:
            if tmp.exists():
                try:
                    tmp.unlink()
                except OSError:
                    pass
    return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        # the .so name embeds the source hash, so existence IS freshness
        if not _LIB_PATH.exists() and not _build():
            _build_failed = True
            return None
        # drop superseded builds so dev loops don't accumulate one .so per
        # source revision. Other-hash binaries are deleted only in the
        # IN-TREE csrc dir, whose contents map 1:1 to the current source —
        # in the SHARED user cache dir another installed version may be
        # live under a different hash (deleting it would rebuild
        # ping-pong); there only the legacy unhashed name is cleaned.
        in_tree = _LIB_PATH.parent == _SRC
        for stale in _LIB_PATH.parent.glob("_pointreggpt_native*.so"):
            if stale == _LIB_PATH:
                continue
            if in_tree or stale.name == "_pointreggpt_native.so":
                try:
                    stale.unlink()
                except OSError:
                    pass  # another process may hold/clean it concurrently
        try:
            lib = ctypes.CDLL(str(_LIB_PATH))
        except OSError:
            _build_failed = True
            return None

        lib.depth_preprocess.restype = ctypes.c_int
        lib.depth_preprocess.argtypes = [
            ctypes.POINTER(ctypes.c_uint16), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_float)]
        lib.voxel_downsample.restype = ctypes.c_int
        lib.voxel_downsample.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_float,
            ctypes.POINTER(ctypes.c_float)]
        lib.radius_hits.restype = None
        lib.radius_hits.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_float,
            ctypes.POINTER(ctypes.c_uint8)]
        lib.ply_pack.restype = ctypes.c_int64
        lib.ply_pack.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.c_char_p, ctypes.c_int64]
        lib.png16_dims.restype = ctypes.c_int
        lib.png16_dims.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
        lib.png16_decode.restype = ctypes.c_int
        lib.png16_decode.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint16), ctypes.c_int64]
        lib.png16_depth_preprocess.restype = ctypes.c_int
        lib.png16_depth_preprocess.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_float)]
        _lib = lib
        return _lib


def is_available() -> bool:
    """True when the native library built and loaded."""
    return _load() is not None


def depth_preprocess(raw: np.ndarray, out_size: int,
                     flip: bool = False) -> np.ndarray:
    """uint16 (h, w) mm depth -> (out_size, out_size) float32 [0,1]."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    raw = np.ascontiguousarray(raw, dtype=np.uint16)
    out = np.empty((out_size, out_size), np.float32)
    rc = lib.depth_preprocess(
        raw.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
        raw.shape[0], raw.shape[1], out_size, int(flip),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    if rc != 0:
        raise ValueError(f"depth_preprocess failed (rc={rc}, "
                         f"shape={raw.shape}, out_size={out_size})")
    return out


def png16_decode(png_bytes: bytes) -> Optional[np.ndarray]:
    """Decode a 16-bit grayscale PNG to (h, w) uint16, or None when the
    bytes are not the supported production format — including non-PNG
    content (caller falls back to PIL, which decodes by content). Raises
    only on decode-stage corruption of a confirmed supported PNG."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    buf = np.frombuffer(png_bytes, np.uint8)
    ptr = buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
    h = ctypes.c_int()
    w = ctypes.c_int()
    rc = lib.png16_dims(ptr, buf.size, ctypes.byref(h), ctypes.byref(w))
    # 1/2: not a (well-formed) PNG at all — e.g. a TIFF/JPEG mislabeled
    # *.png, which PIL decodes by CONTENT and the reference pipeline
    # trains on, so it must reach the PIL fallback rather than raise;
    # 3: over the 64-Mpix allocation cap (a LEGITIMATE huge image decodes
    # via PIL, which has its own decompression-bomb guard); 4/5:
    # unsupported bit depth/color/interlace
    if rc in (1, 2, 3, 4, 5):
        return None
    if rc != 0:
        raise ValueError(f"png16_dims failed (rc={rc})")
    out = np.empty((h.value, w.value), np.uint16)
    rc = lib.png16_decode(
        ptr, buf.size, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
        out.size)
    if rc != 0:
        raise ValueError(f"png16_decode failed (rc={rc})")
    return out


def png16_depth_preprocess(png_bytes: bytes, out_size: int,
                           flip: bool = False) -> Optional[np.ndarray]:
    """Fused PNG decode + model-space preprocessing (the dataloader hot
    path): bytes -> (out_size, out_size) float32 [0,1]. Returns None when
    the PNG is not 16-bit grayscale non-interlaced (PIL fallback)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    buf = np.frombuffer(png_bytes, np.uint8)
    out = np.empty((out_size, out_size), np.float32)
    rc = lib.png16_depth_preprocess(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), buf.size,
        out_size, int(flip),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    # 1-5: not the supported production format (incl. not-a-PNG and the
    # too-small-to-crop case, which shares codes 1/2 with png16_dims) ->
    # PIL fallback; >= 6 is decode-stage corruption of a confirmed
    # supported PNG, which IS an error
    if rc in (1, 2, 3, 4, 5):
        return None
    if rc != 0:
        raise ValueError(f"png16_depth_preprocess failed (rc={rc})")
    return out


def voxel_downsample_host(points: np.ndarray, voxel: float) -> np.ndarray:
    """(n, 3) -> (m, 3) voxel centroids (Open3D semantics), on host."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    pts = np.ascontiguousarray(points, dtype=np.float32)
    out = np.empty_like(pts)
    m = lib.voxel_downsample(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), pts.shape[0],
        voxel, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out[:m].copy()


def radius_hits_host(src: np.ndarray, tgt: np.ndarray,
                     radius: float) -> np.ndarray:
    """(n,) bool: any tgt point within radius of each src point (host)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    s = np.ascontiguousarray(src, dtype=np.float32)
    t = np.ascontiguousarray(tgt, dtype=np.float32)
    hits = np.empty((s.shape[0],), np.uint8)
    lib.radius_hits(
        s.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), s.shape[0],
        t.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), t.shape[0],
        radius, hits.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return hits.astype(bool)


def ply_pack(points: np.ndarray) -> bytes:
    """Pack (n, 3) points into binary-little-endian PLY bytes."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    pts = np.ascontiguousarray(points, dtype=np.float32)
    buf_size = 256 + pts.shape[0] * 12
    buf = ctypes.create_string_buffer(buf_size)
    n = lib.ply_pack(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), pts.shape[0],
        buf, buf_size)
    if n < 0:
        raise ValueError("ply_pack buffer too small")
    return buf.raw[:n]
