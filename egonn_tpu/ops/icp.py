"""Host-side ICP (point-to-point) — optional ground-truth refinement.

Replaces the reference's Open3D registration_icp wrapper (misc/point_clouds.py:
31-62: voxel 0.1 m downsample, inlier distance 1.2 m, 200 iterations).  Host-side
numpy (scipy cKDTree when available, chunked brute force otherwise); this runs in
the offline/eval path only (BASELINE.json: "host-side ICP refinement kept
optional").
"""
from __future__ import annotations

import numpy as np


def _voxel_downsample(pc: np.ndarray, voxel: float) -> np.ndarray:
    coords = np.floor(pc / voxel).astype(np.int64)
    _, idx = np.unique(coords, axis=0, return_index=True)
    return pc[np.sort(idx)]


def _nn(query: np.ndarray, ref: np.ndarray):
    try:
        from scipy.spatial import cKDTree

        tree = cKDTree(ref)
        d, i = tree.query(query)
        return d, i
    except ImportError:
        # chunked brute force
        d_out = np.empty(len(query))
        i_out = np.empty(len(query), dtype=np.int64)
        for s in range(0, len(query), 2048):
            c = query[s : s + 2048]
            d = np.linalg.norm(c[:, None] - ref[None], axis=-1)
            i_out[s : s + 2048] = d.argmin(axis=1)
            d_out[s : s + 2048] = d.min(axis=1)
        return d_out, i_out


def _kabsch_np(p: np.ndarray, q: np.ndarray) -> np.ndarray:
    mu_p, mu_q = p.mean(0), q.mean(0)
    h = (p - mu_p).T @ (q - mu_q)
    u, _, vt = np.linalg.svd(h)
    d = np.sign(np.linalg.det(vt.T @ u.T))
    r = vt.T @ np.diag([1.0, 1.0, d]) @ u.T
    m = np.eye(4)
    m[:3, :3] = r
    m[:3, 3] = mu_q - r @ mu_p
    return m


def icp_point_to_point(pc1: np.ndarray, pc2: np.ndarray, init: np.ndarray,
                       voxel: float = 0.1, max_distance: float = 1.2,
                       max_iters: int = 200, tol: float = 1e-6) -> np.ndarray:
    """Refine `init` (pc1 -> pc2) with point-to-point ICP.

    Parameters mirror the reference misc/point_clouds.py:31-62 defaults."""
    p = _voxel_downsample(np.asarray(pc1, np.float64), voxel)
    q = _voxel_downsample(np.asarray(pc2, np.float64), voxel)
    t = np.array(init, np.float64)
    prev_err = np.inf
    for _ in range(max_iters):
        p_t = p @ t[:3, :3].T + t[:3, 3]
        d, idx = _nn(p_t, q)
        sel = d <= max_distance
        if sel.sum() < 3:
            break
        m = _kabsch_np(p_t[sel], q[idx[sel]])
        t = m @ t
        err = float(np.mean(d[sel]))
        if abs(prev_err - err) < tol:
            break
        prev_err = err
    return t
