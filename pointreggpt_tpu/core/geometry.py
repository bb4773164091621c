"""Camera / depth-map geometry kernels, TPU-first.

This is the single deduplicated geometry library (the reference duplicates
these helpers verbatim in two packages; see SURVEY.md §1). Everything here is
a pure, jittable JAX function with **static shapes**: instead of boolean
compaction (``pc[valid]``), points are kept as dense ``(b, n, 3)`` arrays with
a parallel ``(b, n)`` validity mask, which is the formulation the TPU needs.

Conventions
-----------
- Depth images are ``(b, h, w)`` float32 **in meters** unless a function says
  otherwise (the model-space unit of 10 m is handled by callers, matching the
  reference's ``depth * 10`` at geometry boundaries).
- Intrinsics are ``(b, 3, 3)`` pinhole matrices (fx, fy, cx, cy).
- Poses are ``(b, 4, 4)`` SE(3) matrices applied as ``p' = R p + t``.

Reference parity
----------------
Semantics match the PyTorch reference (file "sdd" =
denoising_diffusion_pytorch/successive_ddnm_diffusion.py):
- depth2pc_tensor            sdd:176-209
- pc2depth_tensor            sdd:212-265 (scatter-min ``amin`` z-buffer;
                             the depth_correction argsort variant computes
                             the same nearest-point-wins result, dc:306-351)
- reproject_tensor           sdd:268-286
- occlusion_filter           sdd:446-463
- image_condition            sdd:466-508
- intrinsic_transform        sdd:47-119
- point_cloud / depth_image  sdd:122-173 (host/numpy variants)
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

Array = jax.Array

# ---------------------------------------------------------------------------
# Intrinsics
# ---------------------------------------------------------------------------


def intrinsic_transform(
    intrinsic: np.ndarray,
    resize: Optional[Union[int, Tuple[int, int]]] = None,
    centercrop: Optional[Union[int, Tuple[int, int]]] = None,
) -> np.ndarray:
    """Adjust pinhole intrinsics for a resize followed by a center crop.

    Host-side (numpy): intrinsics are tiny per-scene metadata. With
    ``resize`` as an int the *short* image side is scaled to that value and
    the other side scaled proportionally (floor), mirroring the reference and
    PIL's short-side resize. Reference: sdd:47-119.

    Args:
        intrinsic: (..., 3, 3) pinhole matrix. Image size is inferred as
            ``(2*cy, 2*cx)`` (principal point assumed centered), exactly as
            the reference does.
        resize: target short side (int) or exact ``(h, w)``.
        centercrop: crop size (int) or ``(h, w)``, taken about the center.

    Returns:
        New (..., 3, 3) intrinsic for the transformed image.
    """
    intrinsic = np.asarray(intrinsic)
    old_fx = intrinsic[..., 0, 0]
    old_fy = intrinsic[..., 1, 1]
    old_cx = intrinsic[..., 0, 2]
    old_cy = intrinsic[..., 1, 2]

    old_w = np.int32(old_cx * 2)
    old_h = np.int32(old_cy * 2)

    new_fx, new_fy = old_fx, old_fy
    new_cx, new_cy = old_cx, old_cy
    new_w, new_h = old_w, old_h

    if resize is not None:
        if isinstance(resize, (int, np.integer)):
            # short side -> resize, long side scaled proportionally (floor)
            if np.all(old_w < old_h):
                new_w = np.int32(resize)
                new_h = np.int32(np.floor(resize * old_h / old_w))
            else:
                new_w = np.int32(np.floor(resize * old_w / old_h))
                new_h = np.int32(resize)
        else:
            new_h = np.int32(resize[0])
            new_w = np.int32(resize[1])
        new_fx = np.float32(old_fx * new_w / old_w)
        new_fy = np.float32(old_fy * new_h / old_h)
        new_cx = np.float32(new_w / 2)
        new_cy = np.float32(new_h / 2)

    if centercrop is not None:
        if isinstance(centercrop, (int, np.integer)):
            crop_w = crop_h = int(centercrop)
        else:
            crop_h, crop_w = int(centercrop[0]), int(centercrop[1])
        crop_left = np.int32(np.round((new_w - crop_w) / 2.0))
        crop_top = np.int32(np.round((new_h - crop_h) / 2.0))
        new_cx = new_cx - crop_left
        new_cy = new_cy - crop_top

    out = np.zeros_like(intrinsic, dtype=np.float64)
    out[..., 0, 0] = new_fx
    out[..., 1, 1] = new_fy
    out[..., 0, 2] = new_cx
    out[..., 1, 2] = new_cy
    out[..., 2, 2] = 1.0
    return out.astype(intrinsic.dtype)


def param_vector(intrinsic: Array) -> Array:
    """(…, 3, 3) intrinsic -> (…, 4) [fx, fy, cx, cy] conditioning vector.

    Reference: sdd:343-351.
    """
    fx = intrinsic[..., 0, 0]
    fy = intrinsic[..., 1, 1]
    cx = intrinsic[..., 0, 2]
    cy = intrinsic[..., 1, 2]
    return jnp.stack([fx, fy, cx, cy], axis=-1)


# ---------------------------------------------------------------------------
# Depth <-> point cloud (batched, static shapes)
# ---------------------------------------------------------------------------


def depth_to_points(
    depth: Array,
    intrinsic: Array,
    *,
    clip: Optional[Tuple[float, float]] = (0.0, 10.0),
) -> Tuple[Array, Array]:
    """Back-project depth maps to camera-frame points (padded + masked).

    Reference: depth2pc_tensor sdd:176-209, with ``invalid_num=0`` instead of
    NaN: invalid entries are zeroed and flagged in the mask (NaNs poison TPU
    arithmetic and the mask carries the same information).

    Args:
        depth: (b, h, w) depth in meters.
        intrinsic: (b, 3, 3).
        clip: (near, far) validity range in meters, or None to keep all.

    Returns:
        points: (b, h*w, 3) xyz, zeros where invalid.
        valid:  (b, h*w) bool.
    """
    b, h, w = depth.shape
    fx = intrinsic[:, 0, 0][:, None, None]
    fy = intrinsic[:, 1, 1][:, None, None]
    cx = intrinsic[:, 0, 2][:, None, None]
    cy = intrinsic[:, 1, 2][:, None, None]

    r = lax.broadcasted_iota(depth.dtype, (b, h, w), 1)
    c = lax.broadcasted_iota(depth.dtype, (b, h, w), 2)

    if clip is None:
        valid = jnp.ones_like(depth, dtype=bool)
    else:
        valid = (depth > clip[0]) & (depth < clip[1])

    z = jnp.where(valid, depth, 0.0)
    x = jnp.where(valid, (c - cx) * z / fx, 0.0)
    y = jnp.where(valid, (r - cy) * z / fy, 0.0)

    points = jnp.stack([x, y, z], axis=-1).reshape(b, h * w, 3)
    return points, valid.reshape(b, h * w)


def points_to_depth(
    points: Array,
    valid: Array,
    intrinsic: Array,
    *,
    image_size: Sequence[int] = (480, 640),
) -> Tuple[Array, Array]:
    """Forward-project points into a z-buffered depth image (scatter-min).

    The z-buffer is a scatter-min over linearized pixel indices: among all
    points landing on a pixel, the smallest (closest) depth wins; untouched
    pixels are 0 and masked out. Reference: pc2depth_tensor sdd:212-265
    (``scatter_reduce(reduce="amin", include_self=False)``); the
    depth_correction argsort-descending variant (dc:306-351) computes the same
    nearest-point-wins result, so this is the single standardized z-buffer.

    On TPU the ``.at[].min`` lowers to an XLA scatter-min; see
    ``pointreggpt_tpu.ops.splat`` for the fused Pallas projection+splat path.

    Args:
        points: (b, n, 3) camera-frame xyz.
        valid: (b, n) bool.
        intrinsic: (b, 3, 3).
        image_size: (h, w) of the output depth image.

    Returns:
        depth: (b, h, w) float32, 0 where no point landed.
        mask:  (b, h, w) bool, True where a point landed.
    """
    b, n, _ = points.shape
    h, w = int(image_size[0]), int(image_size[1])

    fx = intrinsic[:, 0, 0][:, None]
    fy = intrinsic[:, 1, 1][:, None]
    cx = intrinsic[:, 0, 2][:, None]
    cy = intrinsic[:, 1, 2][:, None]

    x = points[..., 0]
    y = points[..., 1]
    z = points[..., 2]
    z_safe = jnp.where(z == 0, 1.0, z)

    # round() is round-half-to-even in both torch and jnp -> bitwise parity.
    c = jnp.round(x * fx / z_safe + cx).astype(jnp.int32)
    r = jnp.round(y * fy / z_safe + cy).astype(jnp.int32)

    ok = valid & (c >= 0) & (c < w) & (r >= 0) & (r < h) & (z > 0)

    # Route invalid points to slot 0 with a +inf payload: min(inf, .) is a
    # no-op, keeping the scatter fully dense/static.
    lin = jnp.where(ok, r * w + c, 0)
    payload = jnp.where(ok, z, jnp.inf).astype(jnp.float32)

    flat_init = jnp.full((b, h * w), jnp.inf, dtype=jnp.float32)
    batch_idx = lax.broadcasted_iota(jnp.int32, (b, n), 0)
    depth_flat = flat_init.at[batch_idx, lin].min(payload, mode="drop")

    mask_flat = jnp.zeros((b, h * w), dtype=bool).at[batch_idx, lin].max(
        ok, mode="drop")

    depth = jnp.where(mask_flat, depth_flat, 0.0).reshape(b, h, w)
    return depth, mask_flat.reshape(b, h, w)


def transform_points(points: Array, pose: Array) -> Array:
    """Apply SE(3) poses: ``p' = R p + t``.

    Args:
        points: (b, n, 3).
        pose: (b, 4, 4) or (b, 3, 4).
    """
    rot = pose[:, :3, :3]
    t = pose[:, :3, 3]
    # Full-precision matmul: TPU matmuls default to bf16 inputs, which is
    # fatal for pixel-exact re-projection (rounding flips pixel indices).
    return jnp.einsum("bij,bnj->bni", rot, points,
                      precision=lax.Precision.HIGHEST) + t[:, None, :]


def reproject(
    depth: Array,
    intrinsic: Array,
    relative_pose: Array,
    *,
    clip: Optional[Tuple[float, float]] = (0.0, 10.0),
) -> Tuple[Array, Array]:
    """depth -> points -> SE(3) motion -> z-buffered depth (same intrinsics).

    The core "random camera motion re-projection" op. Reference:
    reproject_tensor sdd:268-286.

    Args:
        depth: (b, h, w) meters.
        intrinsic: (b, 3, 3).
        relative_pose: (b, 4, 4).

    Returns:
        (depth_reprojected (b,h,w), mask (b,h,w)).
    """
    b, h, w = depth.shape
    points, valid = depth_to_points(depth, intrinsic, clip=clip)
    points = transform_points(points, relative_pose)
    return points_to_depth(points, valid, intrinsic, image_size=(h, w))


# ---------------------------------------------------------------------------
# Occlusion filtering / min-pool
# ---------------------------------------------------------------------------


def min_pool(depth: Array, *, window: int = 3, stride: int = 1) -> Array:
    """Min-pool with +inf padding over the trailing two dims of (b, h, w).

    Equivalent of the reference's ``-max_pool2d(-x)`` trick (implicit -inf
    padding); on TPU this is a single fused ``lax.reduce_window``.
    """
    return lax.reduce_window(
        depth,
        jnp.array(jnp.inf, depth.dtype),
        lax.min,
        window_dimensions=(1, window, window),
        window_strides=(1, stride, stride),
        padding="SAME",
    )


def occlusion_filter(
    depth_rpj: Array,
    mask_rpj: Array,
    *,
    threshold: float = 0.0375,
) -> Tuple[Array, Array]:
    """Suppress see-through-surface speckle after re-projection.

    Pixels more than ``threshold`` above their 3x3 valid-neighborhood minimum
    are replaced by that minimum (points from an occluded surface poking
    through the near surface). Reference: sdd:446-463; the returned mask is
    passed through unchanged, as in the reference.

    Args:
        depth_rpj: (b, h, w) meters.
        mask_rpj: (b, h, w) bool validity.
    """
    depth_pre = jnp.where(mask_rpj, depth_rpj, jnp.inf)
    min_neighbors = min_pool(depth_pre, window=3, stride=1)
    keep = (depth_rpj - min_neighbors) < threshold
    out = jnp.where(keep, depth_rpj, min_neighbors)
    return out, mask_rpj


# ---------------------------------------------------------------------------
# Image conditioning (model space)
# ---------------------------------------------------------------------------


def normalize_to_neg_one_to_one(img: Array) -> Array:
    """[0, 1] -> [-1, 1]. Reference: sdd:556-557."""
    return img * 2.0 - 1.0


def unnormalize_to_zero_to_one(img: Array) -> Array:
    """[-1, 1] -> [0, 1]. Reference: sdd:560-561."""
    return (img + 1.0) * 0.5


def image_condition(
    depth01: Array,
    intrinsic: Array,
    relative_pose: Array,
    *,
    depth_unit: float = 10.0,
    depth_clip: Tuple[float, float] = (0.0, 10.0),
    use_occlusion_filter: bool = False,
) -> Array:
    """Build the 2-channel DDNM conditioning image.

    Channel 0 is the re-projected depth (unit-normalized), channel 1 the
    validity mask; both mapped to [-1, 1]. Reference: sdd:466-496.

    Args:
        depth01: (b, h, w) depth in [0, 1] model units (1.0 == depth_unit m).

    Returns:
        img_cond: (b, h, w, 2) in [-1, 1] (NHWC).
    """
    depth_rpj, mask_rpj = reproject(
        depth01 * depth_unit, intrinsic, relative_pose, clip=depth_clip)
    if use_occlusion_filter:
        depth_rpj, mask_rpj = occlusion_filter(depth_rpj, mask_rpj)
    cond = jnp.stack(
        [depth_rpj / depth_unit, mask_rpj.astype(depth_rpj.dtype)], axis=-1)
    return normalize_to_neg_one_to_one(cond)


def null_image_condition(batch_size: int, image_size: int,
                         dtype=jnp.float32) -> Array:
    """All -1 condition == empty mask (unconditional). Reference: sdd:499-504."""
    return -jnp.ones((batch_size, image_size, image_size, 2), dtype=dtype)


def mask_from_image_condition(img_cond: Array) -> Array:
    """Recover the bool validity mask from channel 1 of an image condition.

    Reference: get_mask_from_img_cond sdd:507-508 (threshold 0.5 after
    unnormalization).

    Args:
        img_cond: (b, h, w, 2) in [-1, 1].

    Returns:
        (b, h, w) bool.
    """
    return unnormalize_to_zero_to_one(img_cond[..., 1]) > 0.5


# ---------------------------------------------------------------------------
# Host/numpy single-image helpers (I/O boundaries)
# ---------------------------------------------------------------------------


def point_cloud_np(depth: np.ndarray,
                   intrinsic: np.ndarray,
                   clip: Tuple[float, float] = (0.0, 10.0)) -> np.ndarray:
    """Back-project one depth map to an (n, 3) compacted point array (host).

    Used only at file-I/O boundaries where compaction is fine (PLY export).
    Reference: point_cloud sdd:122-143.
    """
    fx, fy = intrinsic[0][0], intrinsic[1][1]
    cx, cy = intrinsic[0][2], intrinsic[1][2]
    rows, cols = depth.shape
    r, c = np.meshgrid(np.arange(rows), np.arange(cols), indexing="ij")
    valid = (depth > clip[0]) & (depth < clip[1])
    z = depth
    x = (c - cx) * z / fx
    y = (r - cy) * z / fy
    pc = np.stack([x, y, z], axis=-1).reshape(-1, 3)
    return pc[valid.reshape(-1)].astype(np.float32)


def depth_image_np(pc: np.ndarray,
                   intrinsic: np.ndarray,
                   image_size: Tuple[int, int] = (480, 640)):
    """Forward-project a host point array to a depth image + mask.

    Inventory-parity port of the reference's ``depth_image`` (sdd:146-173,
    dead code there) with its row/column transposition bug fixed: pixels are
    indexed ``[row, col]`` and ties resolve nearest-point-wins (consistent
    with :func:`points_to_depth`). Host-side convenience only — the device
    path is :func:`points_to_depth`.

    Returns:
        (depth (h, w) float32, mask (h, w) bool).
    """
    rows, cols = image_size
    fx, fy = intrinsic[0][0], intrinsic[1][1]
    cx, cy = intrinsic[0][2], intrinsic[1][2]
    x, y, z = pc[..., 0], pc[..., 1], pc[..., 2]
    with np.errstate(divide="ignore", invalid="ignore"):
        c = np.round(x * fx / np.where(z == 0, 1, z) + cx).astype(np.int64)
        r = np.round(y * fy / np.where(z == 0, 1, z) + cy).astype(np.int64)
    ok = (c >= 0) & (c < cols) & (r >= 0) & (r < rows) & (z > 0)
    depth = np.full((rows, cols), np.inf, np.float32)
    np.minimum.at(depth, (r[ok], c[ok]), z[ok].astype(np.float32))
    mask = np.isfinite(depth)
    depth = np.where(mask, depth, 0.0)
    return depth, mask
