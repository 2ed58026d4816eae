"""Geometry utilities: polar conversion, SE(3) pose math.

JAX re-implementations with the exact numerics of the reference
(misc/poses.py, datasets/quantization.py:35-53, datasets/mulran/utils.py:111-125,
datasets/kitti/utils.py:4-18 in jac99/Egonn). All functions are jit/vmap friendly
and operate on float32 unless noted.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# --------------------------------------------------------------------------
# Polar <-> cartesian (reference: datasets/quantization.py:29-53)
# --------------------------------------------------------------------------


def cartesian_to_polar(pc: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) cartesian XYZ -> (..., 3) polar (theta_deg in [0, 360), range, z).

    theta = 180 + atan2(y, x) * 180/pi — exactly the reference formula
    (datasets/quantization.py:35).
    """
    theta = 180.0 + jnp.arctan2(pc[..., 1], pc[..., 0]) * (180.0 / np.pi)
    dist = jnp.sqrt(pc[..., 0] ** 2 + pc[..., 1] ** 2)
    return jnp.stack([theta, dist, pc[..., 2]], axis=-1)


def polar_to_cartesian(pc: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) polar (theta_deg, range, z) -> (..., 3) cartesian.

    Reference: datasets/quantization.py:46-53 (PolarQuantizer.to_cartesian).
    """
    theta = np.pi * (pc[..., 0] - 180.0) / 180.0
    x = jnp.cos(theta) * pc[..., 1]
    y = jnp.sin(theta) * pc[..., 1]
    return jnp.stack([x, y, pc[..., 2]], axis=-1)


# --------------------------------------------------------------------------
# SE(3) pose math (reference: misc/poses.py)
# --------------------------------------------------------------------------


def apply_transform(pc: jnp.ndarray, m: jnp.ndarray) -> jnp.ndarray:
    """Apply a 4x4 SE(3) (or 3x3 SE(2)) transform to an (..., N, D) point set.

    Matches misc/poses.py:68-76: pc @ R^T + t.  Batched: m may be (..., D+1, D+1)
    with leading dims broadcasting against pc's leading dims.
    """
    d = pc.shape[-1]
    rot = m[..., :d, :d]
    t = m[..., :d, -1]
    return pc @ jnp.swapaxes(rot, -1, -2) + t[..., None, :]


def relative_pose(m1: np.ndarray, m2: np.ndarray) -> np.ndarray:
    """Generic relative pose: coords in frame1 -> coords in frame2.

    Reference misc/poses.py:79-89.  DO NOT use for MulRan poses — use
    mulran_relative_pose (sign-fixed) instead.
    """
    return np.linalg.inv(m2) @ m1


def mulran_relative_pose(m1: np.ndarray, m2: np.ndarray) -> np.ndarray:
    """MulRan-specific relative pose with the translation sign fix.

    Reference datasets/mulran/utils.py:111-125: m = inv(m2) @ m1 followed by
    m[:3, 3] = -m[:3, 3].  Dropping the sign fix silently breaks local
    training/eval on MulRan.
    """
    m = np.linalg.inv(m2) @ m1
    m = m.copy()
    m[:3, 3] = -m[:3, 3]
    return m


# KITTI velodyne->camera calibration, hardcoded as in the reference
# (datasets/kitti/utils.py:4-12).
KITTI_VELO2CAM = np.array(
    [
        [7.533745e-03, -9.999714e-01, -6.166020e-04, -4.069766e-03],
        [1.480249e-02, 7.280733e-04, -9.998902e-01, -7.631618e-02],
        [9.998621e-01, 7.523790e-03, 1.480755e-02, -2.717806e-01],
        [0.0, 0.0, 0.0, 1.0],
    ],
    dtype=np.float64,
)


def kitti_relative_pose(m1: np.ndarray, m2: np.ndarray) -> np.ndarray:
    """FCGF-style KITTI relative pose in the velodyne frame.

    Reference datasets/kitti/utils.py:14-18:
    M = (velo2cam @ m1.T @ inv(m2.T) @ inv(velo2cam)).T
    where m1, m2 are cam0-frame poses from poses/XX.txt.
    """
    m = (KITTI_VELO2CAM @ m1.T @ np.linalg.inv(m2.T) @ np.linalg.inv(KITTI_VELO2CAM)).T
    return m


def q2r(q) -> np.ndarray:
    """Rotation matrix from a Hamiltonian quaternion (w, x, y, z).

    Reference misc/poses.py:5-18.
    """
    w, x, y, z = tuple(q)
    n = 1.0 / np.sqrt(x * x + y * y + z * z + w * w)
    x *= n
    y *= n
    z *= n
    w *= n
    return np.array(
        [
            [1.0 - 2.0 * y * y - 2.0 * z * z, 2.0 * x * y - 2.0 * z * w, 2.0 * x * z + 2.0 * y * w],
            [2.0 * x * y + 2.0 * z * w, 1.0 - 2.0 * x * x - 2.0 * z * z, 2.0 * y * z - 2.0 * x * w],
            [2.0 * x * z - 2.0 * y * w, 2.0 * y * z + 2.0 * x * w, 1.0 - 2.0 * x * x - 2.0 * y * y],
        ]
    )


def m2ypr(m: np.ndarray):
    """4x4 transform -> (yaw, pitch, roll).  Reference misc/poses.py:21-32."""
    assert m.shape == (4, 4)
    pitch = np.arctan2(-m[2][0], np.sqrt(m[0][0] ** 2 + m[1][0] ** 2))
    assert not np.isclose(np.abs(pitch), np.pi / 2), "gimbal lock not handled"
    yaw = np.arctan2(m[1][0], m[0][0])
    roll = np.arctan2(m[2][1], m[2][2])
    return yaw, pitch, roll


def m2xyz_ypr(m: np.ndarray):
    """4x4 transform -> (x, y, z, yaw, pitch, roll).  Reference misc/poses.py:35-42."""
    yaw, pitch, roll = m2ypr(m)
    return m[0, 3], m[1, 3], m[2, 3], yaw, pitch, roll


def rotz(theta: float) -> np.ndarray:
    """4x4 rotation about +z by theta radians (host-side helper)."""
    c, s = np.cos(theta), np.sin(theta)
    m = np.eye(4, dtype=np.float64)
    m[0, 0], m[0, 1], m[1, 0], m[1, 1] = c, -s, s, c
    return m


def rotation_error_deg(r_est: jnp.ndarray, r_gt: jnp.ndarray) -> jnp.ndarray:
    """Trace-angle rotation error in degrees between (..., 3, 3) rotations.

    Matches the RRE computation in eval/evaluate.py:261-267 of the reference:
    arccos((trace(R_est^T R_gt) - 1) / 2) * 180/pi.
    """
    cos = (jnp.einsum("...ij,...ij->...", r_est, r_gt) - 1.0) / 2.0
    cos = jnp.clip(cos, -1.0, 1.0)
    return jnp.degrees(jnp.arccos(cos))
