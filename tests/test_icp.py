"""ICP refinement tests (ops/icp.py): point-to-point and point-to-plane both
recover a small perturbation of a known transform on a structured scene.
Reference: misc/point_clouds.py:31-62 (Open3D registration_icp wrapper with
point2point | point2plane estimation)."""
import numpy as np

from egonn_tpu.ops.geometry import rotz
from egonn_tpu.ops.icp import estimate_normals, icp, icp_point_to_plane, icp_point_to_point


def _scene(rng, n=4000):
    """Walls + ground: surfaces with well-defined normals."""
    pts = []
    # ground plane
    g = rng.uniform(-20, 20, (n // 2, 2))
    pts.append(np.column_stack([g, rng.normal(0, 0.01, n // 2)]))
    # two orthogonal walls
    w1 = np.column_stack([
        rng.uniform(-20, 20, n // 4), rng.normal(5, 0.01, n // 4),
        rng.uniform(0, 5, n // 4)])
    w2 = np.column_stack([
        rng.normal(-8, 0.01, n // 4), rng.uniform(-20, 20, n // 4),
        rng.uniform(0, 5, n // 4)])
    pts.extend([w1, w2])
    return np.concatenate(pts).astype(np.float32)


def _true_transform():
    t = rotz(0.05)
    t[:3, 3] = [0.4, -0.3, 0.1]
    return t


def _perturbed(t):
    d = rotz(0.02)
    d[:3, 3] = [0.15, 0.1, -0.05]
    return d @ t


def _errors(t_est, t_true):
    rte = np.linalg.norm(t_est[:3, 3] - t_true[:3, 3])
    cos = (np.trace(t_est[:3, :3].T @ t_true[:3, :3]) - 1) / 2
    rre = np.degrees(np.arccos(np.clip(cos, -1, 1)))
    return rte, rre


def test_icp_point_to_point_refines():
    rng = np.random.default_rng(0)
    pc1 = _scene(rng)
    t_true = _true_transform()
    pc2 = (pc1 @ t_true[:3, :3].T + t_true[:3, 3]).astype(np.float32)
    t_est = icp_point_to_point(pc1, pc2, _perturbed(t_true))
    rte, rre = _errors(t_est, t_true)
    assert rte < 0.05 and rre < 0.5, (rte, rre)


def test_icp_point_to_plane_refines():
    rng = np.random.default_rng(1)
    pc1 = _scene(rng)
    t_true = _true_transform()
    pc2 = (pc1 @ t_true[:3, :3].T + t_true[:3, 3]).astype(np.float32)
    t_est = icp_point_to_plane(pc1, pc2, _perturbed(t_true))
    rte, rre = _errors(t_est, t_true)
    assert rte < 0.05 and rre < 0.5, (rte, rre)
    # rotation stays orthonormal
    r = t_est[:3, :3]
    np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-8)


def test_icp_dispatch():
    rng = np.random.default_rng(2)
    pc1 = _scene(rng, n=1000)
    t_true = _true_transform()
    pc2 = (pc1 @ t_true[:3, :3].T + t_true[:3, 3]).astype(np.float32)
    t_p2p = icp(pc1, pc2, _perturbed(t_true), point2plane=False)
    t_p2l = icp(pc1, pc2, _perturbed(t_true), point2plane=True)
    for t_est in (t_p2p, t_p2l):
        rte, rre = _errors(t_est, t_true)
        assert rte < 0.1 and rre < 1.0


def test_estimate_normals_on_plane():
    rng = np.random.default_rng(3)
    pts = np.column_stack([rng.uniform(-5, 5, (500, 2)), np.zeros(500)])
    n = estimate_normals(pts, k=12)
    # all normals (up to sign) should be +-z
    assert np.all(np.abs(n[:, 2]) > 0.99)
