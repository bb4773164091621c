"""Host-side 16-bit depth PNG I/O and model-space preprocessing.

The reference loads 3DMatch uint16 depth PNGs with PIL, scales by 1e-4 (mm ->
unit of 10 m), clips values > 1 to 0, resizes the short side with NEAREST and
center-crops (sdd:1535-1554, 2356-2361). The same host pipeline is
reproduced here feeding device buffers; writes use cv2's uint16 PNG encoder
like the reference (sdd:2618-2620).
"""

from __future__ import annotations

import os
from typing import Tuple, Union

import numpy as np
from PIL import Image


def read_depth_png(path: Union[str, os.PathLike],
                   use_native: bool = True) -> np.ndarray:
    """Read a 16-bit depth PNG to (h, w) uint16/int32 raw values.

    The production 16-bit grayscale frames decode through the native zlib
    decoder (``native.png16_decode``, bit-identical — tests/test_native.py);
    other formats fall back to PIL.
    """
    if use_native:
        from pointreggpt_tpu import native

        if native.is_available():
            with open(path, "rb") as f:
                data = f.read()
            out = native.png16_decode(data)
            if out is not None:
                return out
            # fall back on the bytes already in memory — no second disk
            # read (same fix as load_depth_model_space)
            import io

            return np.asarray(Image.open(io.BytesIO(data)))
    img = Image.open(path)
    return np.asarray(img)


def write_depth_png(path: Union[str, os.PathLike], depth01: np.ndarray) -> None:
    """Write model-space [0,1] depth as a uint16 millimeter PNG.

    Reference: sdd:2618-2620 (``image * 1e4 -> uint16 -> cv2.imwrite``).
    """
    import cv2

    depth_mm = (np.asarray(depth01, np.float64) * 1e4).astype(np.uint16)
    cv2.imwrite(os.fspath(path), depth_mm)


def to_uint8_image(img01: np.ndarray) -> np.ndarray:
    """[0,1] float image -> uint8 with torchvision ``save_image`` rounding
    (``mul(255).add_(0.5).clamp_(0,255)``): round half up, so 0.5 writes
    128 where plain truncation writes 127. Used for every 8-bit preview
    PNG/GIF so pixels match the reference byte-for-byte."""
    return np.clip(np.asarray(img01, np.float32) * 255.0 + 0.5,
                   0.0, 255.0).astype(np.uint8)


def resize_nearest_short_side(img: np.ndarray, size: int) -> np.ndarray:
    """Resize so the short side == size, NEAREST interpolation (PIL parity).

    Matches torchvision ``T.Resize(size, NEAREST)`` on PIL images
    (sdd:1537): the long side is ``int(size * long / short)`` — TRUNCATED,
    not rounded — which also matches ``geometry.intrinsic_transform``'s
    floor, keeping the pixel grid and the adjusted intrinsics aligned for
    every input aspect ratio (identical at 640x480 where 341.33 floors and
    rounds alike; divergent e.g. at 500x300 -> 426 vs 427).
    """
    h, w = img.shape[:2]
    if h <= w:
        new_h = size
        new_w = int(size * w / h)
    else:
        new_w = size
        new_h = int(size * h / w)
    pil = Image.fromarray(img)
    pil = pil.resize((new_w, new_h), resample=Image.NEAREST)
    return np.asarray(pil)


def center_crop(img: np.ndarray, size: int) -> np.ndarray:
    """Center-crop to (size, size), torchvision rounding parity.

    torchvision CenterCrop: left = round((w - cw) / 2), top likewise.
    """
    h, w = img.shape[:2]
    top = int(round((h - size) / 2.0))
    left = int(round((w - size) / 2.0))
    return img[top:top + size, left:left + size]


def load_depth_model_space(
    path: Union[str, os.PathLike],
    image_size: int,
    *,
    flip: bool = False,
    use_native: bool = True,
) -> np.ndarray:
    """Load a 3DMatch depth PNG into model space: (h, w) float32 in [0, 1].

    Pipeline (reference sdd:1550-1554, 2356-2361, 2458-2459): NEAREST resize
    short side -> image_size, center crop, scale raw mm by 1e-4 so 1.0 ==
    10 m, clip values above 1 to 0 (invalid), optional horizontal flip.

    The whole pipeline — PNG decode (zlib inflate + unfilter) AND
    resize/crop/scale — runs through one native C++ call when the library
    is built (bit-identical to the Python path; tests/test_native.py),
    falling back to PIL/numpy otherwise. Python-side PIL decode was the
    training input pipeline's bottleneck on few-core hosts (round-2
    measurement: ~45 of 81 device-capable img/s).
    """
    raw = None
    if use_native:
        from pointreggpt_tpu import native

        if native.is_available():
            with open(path, "rb") as f:
                data = f.read()
            out = native.png16_depth_preprocess(data, image_size, flip=flip)
            if out is not None:
                return out
            # not the native-supported format: decode the bytes we already
            # read with PIL (no second file read / native retry)
            import io

            raw = np.asarray(Image.open(io.BytesIO(data)))
    if raw is None:
        raw = read_depth_png(path, use_native=False)
    raw = resize_nearest_short_side(raw, image_size)
    if flip:
        # flip BEFORE the crop, like the reference transform order
        # Resize -> RandomHorizontalFlip -> CenterCrop (sdd:1535-1542):
        # at odd crop margins (640x480 -> width 341, margin 85) the two
        # orders select columns one pixel apart
        raw = raw[:, ::-1]
    raw = center_crop(raw, image_size)
    depth = raw.astype(np.float32) * 1e-4
    depth = np.where(depth > 1.0, 0.0, depth)
    return np.ascontiguousarray(depth)
