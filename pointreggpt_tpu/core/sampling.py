"""Random camera-intrinsic and SE(3) pose samplers (jax.random).

The reference samples poses with host numpy/scipy and mostly unseeded RNG
(sdd:354-443); here everything threads an explicit ``jax.random`` key so
generation is reproducible per scene index, and the samplers can run inside
jitted device programs.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

# The six real 3DMatch intrinsic matrices with their empirical sampling
# probabilities. Reference: random_sample_intrinsic sdd:354-374.
INTRINSIC_CANDIDATES = np.array(
    [
        [[585.0, 0.0, 320.0], [0.0, 585.0, 240.0], [0.0, 0.0, 1.0]],
        [[572.0, 0.0, 320.0], [0.0, 572.0, 240.0], [0.0, 0.0, 1.0]],
        [[583.0, 0.0, 320.0], [0.0, 583.0, 240.0], [0.0, 0.0, 1.0]],
        [[540.021232, 0.0, 320.0], [0.0, 540.021232, 240.0], [0.0, 0.0, 1.0]],
        [[570.342205, 0.0, 320.0], [0.0, 570.342205, 240.0], [0.0, 0.0, 1.0]],
        [[533.069214, 0.0, 320.0], [0.0, 533.069214, 240.0], [0.0, 0.0, 1.0]],
    ],
    dtype=np.float32,
)
INTRINSIC_PROBS = np.array([7, 8, 18, 5, 47, 5], dtype=np.float32)
INTRINSIC_PROBS = INTRINSIC_PROBS / INTRINSIC_PROBS.sum()


def euler_xyz_intrinsic_to_matrix(angles: Array) -> Array:
    """Intrinsic-XYZ Euler angles -> rotation matrices.

    Matches ``scipy.spatial.transform.Rotation.from_euler("XYZ", ...)``:
    R = Rx(a) @ Ry(b) @ Rz(c).

    Args:
        angles: (..., 3) [a, b, c] radians.

    Returns:
        (..., 3, 3) rotation matrices.
    """
    a, b, c = angles[..., 0], angles[..., 1], angles[..., 2]
    ca, sa = jnp.cos(a), jnp.sin(a)
    cb, sb = jnp.cos(b), jnp.sin(b)
    cc, sc = jnp.cos(c), jnp.sin(c)

    zeros = jnp.zeros_like(a)
    ones = jnp.ones_like(a)

    rx = jnp.stack(
        [
            jnp.stack([ones, zeros, zeros], -1),
            jnp.stack([zeros, ca, -sa], -1),
            jnp.stack([zeros, sa, ca], -1),
        ],
        axis=-2,
    )
    ry = jnp.stack(
        [
            jnp.stack([cb, zeros, sb], -1),
            jnp.stack([zeros, ones, zeros], -1),
            jnp.stack([-sb, zeros, cb], -1),
        ],
        axis=-2,
    )
    rz = jnp.stack(
        [
            jnp.stack([cc, -sc, zeros], -1),
            jnp.stack([sc, cc, zeros], -1),
            jnp.stack([zeros, zeros, ones], -1),
        ],
        axis=-2,
    )
    # geometry matmul: compose in full fp32 (TPU default precision runs
    # bf16 passes; a ~1e-3 rotation error shifts splatted pixel indices)
    return jnp.matmul(jnp.matmul(rx, ry, precision=jax.lax.Precision.HIGHEST),
                      rz, precision=jax.lax.Precision.HIGHEST)


def _se3(rotation: Array, translation: Array) -> Array:
    """Assemble (b, 4, 4) SE(3) matrices from (b,3,3) + (b,3)."""
    b = rotation.shape[0]
    out = jnp.tile(jnp.eye(4, dtype=rotation.dtype), (b, 1, 1))
    out = out.at[:, :3, :3].set(rotation)
    out = out.at[:, :3, 3].set(translation)
    return out


def random_sample_intrinsic(key: Array, batch_size: int) -> Array:
    """Sample (b, 3, 3) intrinsics from the empirical 3DMatch distribution.

    Reference: sdd:354-374.
    """
    idx = jax.random.choice(
        key,
        len(INTRINSIC_CANDIDATES),
        shape=(batch_size,),
        replace=True,
        p=jnp.asarray(INTRINSIC_PROBS),
    )
    return jnp.asarray(INTRINSIC_CANDIDATES)[idx]


def random_sample_transform(key: Array,
                            intrinsic: Array,
                            image_size: int = 256) -> Array:
    """FoV-bounded random rotation (no translation) for view augmentation.

    Pitch/yaw are bounded so the principal ray stays inside the frustum
    (atan of principal-point offsets over focal lengths); roll is full-range.
    Translation is zero, as in the reference (it multiplies its Gaussian
    translation by 0, sdd:408). Reference: sdd:377-415.

    Args:
        intrinsic: (b, 3, 3) for the target image.

    Returns:
        (b, 4, 4) SE(3).
    """
    b = intrinsic.shape[0]
    h = w = image_size
    fx = intrinsic[:, 0, 0]
    fy = intrinsic[:, 1, 1]
    cx = intrinsic[:, 0, 2]
    cy = intrinsic[:, 1, 2]

    lx, rx = cx, w - cx
    ty, dy = cy, h - cy

    theta_min, theta_max = -jnp.arctan(dy / fy), jnp.arctan(ty / fy)
    phi_min, phi_max = -jnp.arctan(lx / fx), jnp.arctan(rx / fx)

    k1, k2, k3 = jax.random.split(key, 3)
    theta = jax.random.uniform(k1, (b,)) * (theta_max - theta_min) + theta_min
    phi = jax.random.uniform(k2, (b,)) * (phi_max - phi_min) + phi_min
    psi = jax.random.uniform(k3, (b,)) * 2 * jnp.pi - jnp.pi

    rot = euler_xyz_intrinsic_to_matrix(jnp.stack([theta, phi, psi], axis=-1))
    return _se3(rot, jnp.zeros((b, 3), rot.dtype))


def random_sample_pose(key: Array,
                       batch_size: int,
                       center: Sequence[float] = (0.0, 0.0, 3.0)) -> Array:
    """Generation-time camera motion about a pivot in front of the camera.

    Pitch in ±pi/24, yaw in ±pi/12, no roll; the rotation pivots about
    ``center`` (t = c - R c) plus a Gaussian in-plane translation (z zeroed).
    Reference: sdd:417-443.

    Returns:
        (b, 4, 4) SE(3).
    """
    k1, k2, k3 = jax.random.split(key, 3)
    theta = jax.random.uniform(
        k1, (batch_size,), minval=-jnp.pi / 24, maxval=jnp.pi / 24)
    phi = jax.random.uniform(
        k2, (batch_size,), minval=-jnp.pi / 12, maxval=jnp.pi / 12)
    psi = jnp.zeros((batch_size,))

    rot = euler_xyz_intrinsic_to_matrix(jnp.stack([theta, phi, psi], axis=-1))

    c = jnp.asarray(center, dtype=rot.dtype)
    random_trans = jax.random.normal(k3, (batch_size, 3)) / 3.0
    random_trans = random_trans.at[:, -1].set(0.0)
    translation = c - jnp.einsum("bij,j->bi", rot, c,
                                 precision=jax.lax.Precision.HIGHEST) \
        + random_trans
    return _se3(rot, translation)


def haar_uniform_rotation(key: Array, batch_size: int = 1) -> Array:
    """Haar-uniform random rotations on SO(3) via QR decomposition.

    Used by the downstream mixture dataloaders to pose generated pairs.
    Reference: example_dataloader/predator/mixture.py:15-33.

    Returns:
        (b, 3, 3).
    """
    z = jax.random.normal(key, (batch_size, 3, 3))
    q, r = jnp.linalg.qr(z)
    d = jnp.diagonal(r, axis1=-2, axis2=-1)
    q = q * (d / jnp.abs(d))[:, None, :]
    det = jnp.linalg.det(q)
    return q / det[:, None, None]
