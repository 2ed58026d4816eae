"""Synthetic LiDAR place-recognition dataset.

The reference datasets (MulRan / Apollo-SouthBay / KITTI) are multi-hundred-GB
external downloads; this module generates a small procedural stand-in with the SAME
on-disk contract (MulRan-style .bin scans + our pickled TrainingTuple /
EvaluationSet schemas) so the full training/eval stack runs end-to-end on any
machine (SURVEY.md §4's "synthetic mini-dataset" requirement).

World model: a loop trajectory through a procedural city of random vertical
structures (building walls, poles) plus a ground disc.  A scan at pose T contains
the world points within `scan_radius`, transformed into the sensor frame, with
range-dependent subsampling and noise — adjacent poses therefore share geometry
(learnable place recognition) while far-apart poses don't.
"""
from __future__ import annotations

import os
import pickle
from typing import Tuple

import numpy as np

from egonn_tpu.data.base import EvaluationSet, EvaluationTuple, PointCloudLoader, TrainingTuple
from egonn_tpu.ops.geometry import rotz


class SyntheticPointCloudLoader(PointCloudLoader):
    """Reads the MulRan-format .bin scans produced by generate_synthetic_dataset."""

    def set_properties(self):
        self.ground_plane_level = -0.9

    def read_pc(self, file_pathname: str) -> np.ndarray:
        pc = np.fromfile(file_pathname, dtype=np.float32)
        return np.reshape(pc, (-1, 4))[:, :3]


def _make_world(rng: np.random.Generator, extent: float, n_structures: int):
    """Random vertical structures: each a small dense point cluster."""
    pts = []
    for _ in range(n_structures):
        cx, cy = rng.uniform(-extent, extent, 2)
        kind = rng.integers(0, 2)
        if kind == 0:  # wall segment
            length = rng.uniform(5, 25)
            angle = rng.uniform(0, np.pi)
            n = int(length * 24)
            t = rng.uniform(0, length, n)
            x = cx + t * np.cos(angle)
            y = cy + t * np.sin(angle)
            z = rng.uniform(0.0, rng.uniform(3, 12), n)
        else:  # pole / tree
            n = 160
            x = cx + rng.normal(0, 0.3, n)
            y = cy + rng.normal(0, 0.3, n)
            z = rng.uniform(0, rng.uniform(2, 8), n)
        pts.append(np.stack([x, y, z], 1))
    return np.concatenate(pts).astype(np.float32)


def _loop_trajectory(rng, n_scans: int, extent: float):
    """Figure-of-eight loop with revisits; yaw follows the heading."""
    t = np.linspace(0, 2 * np.pi, n_scans, endpoint=False)
    x = 0.65 * extent * np.sin(t)
    y = 0.40 * extent * np.sin(2 * t)
    yaw = np.arctan2(np.gradient(y), np.gradient(x))
    poses = np.zeros((n_scans, 4, 4))
    for i in range(n_scans):
        m = rotz(yaw[i])
        m[0, 3], m[1, 3], m[2, 3] = x[i], y[i], 1.8
        poses[i] = m
    return poses


def _render_scan(rng, world: np.ndarray, pose: np.ndarray, scan_radius: float,
                 max_points: int) -> np.ndarray:
    pos = pose[:3, 3]
    d2 = np.sum((world[:, :2] - pos[None, :2]) ** 2, axis=1)
    near = world[d2 < scan_radius**2]
    # ground disc around the sensor
    n_ground = max(256, len(near) // 3)
    gr = np.sqrt(rng.uniform(1, scan_radius**2, n_ground))
    ga = rng.uniform(0, 2 * np.pi, n_ground)
    ground = np.stack(
        [pos[0] + gr * np.cos(ga), pos[1] + gr * np.sin(ga), np.zeros(n_ground)], 1
    ).astype(np.float32)
    pts_w = np.concatenate([near, ground])
    # world -> sensor frame
    inv = np.linalg.inv(pose)
    pts = pts_w @ inv[:3, :3].T + inv[:3, 3]
    if len(pts) > max_points:
        pts = pts[rng.choice(len(pts), max_points, replace=False)]
    pts = pts + rng.normal(0, 0.02, pts.shape)
    return pts.astype(np.float32)


def generate_synthetic_dataset(
    root: str,
    n_scans: int = 64,
    extent: float = 160.0,
    scan_radius: float = 60.0,
    max_points: int = 16384,
    seed: int = 0,
    positive_radius: float = 10.0,
    non_negative_radius: float = 25.0,
    train_frac: float = 0.75,
) -> Tuple[str, str, str]:
    """Create scans + train/val tuple pickles + an evaluation-set pickle.

    Returns (train_pickle_name, val_pickle_name, eval_pickle_name) relative to root.
    The pickle schemas match the reference's (datasets/base_datasets.py), with
    positives/non-negatives by 2-D pose distance (tuple-generation protocol of
    datasets/mulran/generate_training_tuples.py:50-51) and positives_poses =
    ground-truth relative poses (ICP refinement unnecessary for synthetic data).

    Note: the default positive/non-negative radii are wider than the reference's
    2/10 m because consecutive synthetic scans are ~2*pi*0.55*extent/n_scans
    apart (several meters) — with 2 m positives no tuple would have any.
    """
    rng = np.random.default_rng(seed)
    os.makedirs(os.path.join(root, "scans"), exist_ok=True)
    world = _make_world(rng, extent, n_structures=240)
    poses = _loop_trajectory(rng, n_scans, extent)

    rel_paths = []
    for i in range(n_scans):
        pc = _render_scan(rng, world, poses[i], scan_radius, max_points)
        refl = np.zeros((len(pc), 1), dtype=np.float32)
        rel = os.path.join("scans", f"{i:06d}.bin")
        np.concatenate([pc, refl], axis=1).astype(np.float32).tofile(os.path.join(root, rel))
        rel_paths.append(rel)

    xy = poses[:, :2, 3]
    d = np.linalg.norm(xy[:, None] - xy[None, :], axis=-1)

    def build_tuples(ids):
        ids_arr = np.asarray(sorted(ids))
        queries = {}
        for new_id, i in enumerate(ids_arr):
            # neighbors restricted to the same subset, remapped to compact ids
            pos_sel = [j for j in ids_arr if j != i and d[i, j] <= positive_radius]
            nneg_sel = [j for j in ids_arr if d[i, j] <= non_negative_radius]
            remap = {j: k for k, j in enumerate(ids_arr)}
            positives = np.array(sorted(remap[j] for j in pos_sel), dtype=np.int64)
            non_negatives = np.array(sorted(remap[j] for j in nneg_sel), dtype=np.int64)
            positives_poses = {
                remap[j]: np.linalg.inv(poses[j]) @ poses[i] for j in pos_sel
            }
            queries[new_id] = TrainingTuple(
                id=new_id,
                timestamp=i,
                rel_scan_filepath=rel_paths[i],
                positives=positives,
                non_negatives=non_negatives,
                pose=poses[i],
                positives_poses=positives_poses,
            )
        return queries

    ids = np.arange(n_scans)
    n_train = int(train_frac * n_scans)
    train_ids, val_ids = ids[:n_train], ids[n_train:]

    train_name, val_name, eval_name = (
        "train_synthetic.pickle",
        "val_synthetic.pickle",
        "test_synthetic.pickle",
    )
    with open(os.path.join(root, train_name), "wb") as f:
        pickle.dump(build_tuples(train_ids), f)
    with open(os.path.join(root, val_name), "wb") as f:
        pickle.dump(build_tuples(val_ids), f)

    # evaluation set: even scans = map, odd scans = queries
    map_set = [
        EvaluationTuple(int(i), rel_paths[i], position=xy[i].astype(np.float32), pose=poses[i])
        for i in ids[::2]
    ]
    query_set = [
        EvaluationTuple(int(i), rel_paths[i], position=xy[i].astype(np.float32), pose=poses[i])
        for i in ids[1::2]
    ]
    EvaluationSet(query_set, map_set).save(os.path.join(root, eval_name))
    return train_name, val_name, eval_name
