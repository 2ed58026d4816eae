"""Pose-math parity tests (ops/geometry.py) — the numerics-critical gotchas:
the MulRan translation sign fix, the KITTI velo-frame relative pose, q2r
conventions, m2ypr round trips — plus the device top-k retrieval (ops/knn.py).

Reference counterparts: misc/poses.py, datasets/mulran/utils.py:111-125,
datasets/kitti/utils.py:4-18, eval/evaluate.py:175-176."""
import jax.numpy as jnp
import numpy as np

from egonn_tpu.ops.geometry import (
    KITTI_VELO2CAM,
    apply_transform,
    kitti_relative_pose,
    m2xyz_ypr,
    m2ypr,
    mulran_relative_pose,
    q2r,
    relative_pose,
    rotz,
)
from egonn_tpu.ops.knn import topk_l2


def _random_se3(rng):
    yaw, pitch, roll = rng.uniform(-0.4, 0.4, 3)

    def rx(a):
        c, s = np.cos(a), np.sin(a)
        return np.array([[1, 0, 0], [0, c, -s], [0, s, c]])

    def ry(a):
        c, s = np.cos(a), np.sin(a)
        return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])

    m = np.eye(4)
    m[:3, :3] = rotz(yaw)[:3, :3] @ ry(pitch) @ rx(roll)
    m[:3, 3] = rng.uniform(-10, 10, 3)
    return m


def test_q2r_conventions():
    np.testing.assert_allclose(q2r((1.0, 0, 0, 0)), np.eye(3), atol=1e-12)
    # 90 deg about +z: w-first Hamiltonian (w, x, y, z)
    q = (np.cos(np.pi / 4), 0.0, 0.0, np.sin(np.pi / 4))
    np.testing.assert_allclose(q2r(q), rotz(np.pi / 2)[:3, :3], atol=1e-12)
    # normalization is internal: scaled quaternions give the same rotation
    np.testing.assert_allclose(q2r(tuple(3.7 * v for v in q)),
                               rotz(np.pi / 2)[:3, :3], atol=1e-12)


def test_m2ypr_roundtrip(rng):
    for _ in range(10):
        m = _random_se3(rng)
        yaw, pitch, roll = m2ypr(m)
        # rebuild ZYX euler and compare rotations
        def rx(a):
            c, s = np.cos(a), np.sin(a)
            return np.array([[1, 0, 0], [0, c, -s], [0, s, c]])

        def ry(a):
            c, s = np.cos(a), np.sin(a)
            return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])

        rebuilt = rotz(yaw)[:3, :3] @ ry(pitch) @ rx(roll)
        np.testing.assert_allclose(rebuilt, m[:3, :3], atol=1e-10)
    x, y, z, yaw, _, _ = m2xyz_ypr(m)
    np.testing.assert_allclose([x, y, z], m[:3, 3])


def test_apply_transform_matches_direct(rng):
    m = _random_se3(rng)
    pc = rng.standard_normal((64, 3))
    got = np.asarray(apply_transform(jnp.asarray(pc), jnp.asarray(m)))
    want = pc @ m[:3, :3].T + m[:3, 3]
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_relative_pose_semantics(rng):
    m1, m2 = _random_se3(rng), _random_se3(rng)
    rel = relative_pose(m1, m2)
    # frame1 coords -> frame2 coords: m2 @ rel == m1
    np.testing.assert_allclose(m2 @ rel, m1, atol=1e-10)


def test_mulran_sign_fix(rng):
    """The MulRan variant is the generic relative pose with the TRANSLATION
    negated (reference datasets/mulran/utils.py:122-125) — rotation identical."""
    m1, m2 = _random_se3(rng), _random_se3(rng)
    rel = relative_pose(m1, m2)
    fixed = mulran_relative_pose(m1, m2)
    np.testing.assert_allclose(fixed[:3, :3], rel[:3, :3])
    np.testing.assert_allclose(fixed[:3, 3], -rel[:3, 3])
    # and the input matrices are not mutated
    np.testing.assert_allclose(relative_pose(m1, m2), rel)


def test_kitti_relative_pose_formula(rng):
    m1, m2 = _random_se3(rng), _random_se3(rng)
    got = kitti_relative_pose(m1, m2)
    want = (KITTI_VELO2CAM @ m1.T @ np.linalg.inv(m2.T)
            @ np.linalg.inv(KITTI_VELO2CAM)).T
    np.testing.assert_allclose(got, want, atol=1e-12)
    # velo2cam is a rigid transform
    R = KITTI_VELO2CAM[:3, :3]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-4)


def test_topk_l2_matches_bruteforce(rng):
    map_e = rng.standard_normal((200, 32)).astype(np.float32)
    query_e = rng.standard_normal((33, 32)).astype(np.float32)
    idx = topk_l2(map_e, query_e, k=5, chunk=16)
    d = np.linalg.norm(query_e[:, None, :] - map_e[None], axis=-1)
    want = np.argsort(d, axis=1)[:, :5]
    # compare DISTANCES not indices (ties/float assoc may reorder equals)
    np.testing.assert_allclose(
        np.take_along_axis(d, idx, 1), np.take_along_axis(d, want, 1),
        rtol=1e-4, atol=1e-4)
