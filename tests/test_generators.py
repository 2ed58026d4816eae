"""End-to-end fixture tests for the offline tuple / evaluation-set generators.

These are the first components real MulRan / Apollo-SouthBay / KITTI mounts
would hit; each test synthesizes a miniature dataset tree in the exact on-disk
layout the raw loaders expect (reference layouts: datasets/mulran/mulran_raw.py,
datasets/southbay/southbay_raw.py, datasets/kitti/kitti_raw.py) and runs the
full generator, asserting the reference pickle schemas round-trip."""
import os
import pickle
import sys

import numpy as np
import pytest

from egonn_tpu.data.base import EvaluationSet


def _ring_cloud(rng, n=256, z0=0.5):
    th = rng.uniform(0, 2 * np.pi, n)
    r = rng.uniform(5, 40, n)
    z = rng.uniform(z0, z0 + 4, n)
    return np.stack([r * np.cos(th), r * np.sin(th), z], 1).astype(np.float32)


# ---------------------------------------------------------------------------
# MulRan
# ---------------------------------------------------------------------------

MULRAN_TEST_CENTRE = np.array([345090.0743, 4037591.323])  # inside geofence
MULRAN_TRAIN_BASE = np.array([340000.0, 4030000.0])        # >550 m from all


def _write_mulran_sequence(root, name, positions, ts0, rng):
    seq = os.path.join(root, name)
    os.makedirs(os.path.join(seq, "Ouster"))
    lines = []
    for i, (x, y) in enumerate(positions):
        ts = ts0 + i * 2_000_000_000  # 2 s apart, exactly matching a pose row
        pose = np.eye(4)
        pose[0, 3], pose[1, 3] = x, y
        row = pose[:3, :4].reshape(-1)
        lines.append(",".join([str(ts)] + [f"{v:.6f}" for v in row]))
        pc = _ring_cloud(rng)
        pad = np.concatenate([pc, np.zeros((len(pc), 1), np.float32)], 1)
        pad.tofile(os.path.join(seq, "Ouster", f"{ts}.bin"))
    with open(os.path.join(seq, "global_pose.csv"), "w") as f:
        f.write("\n".join(lines) + "\n")


@pytest.fixture()
def mulran_root(tmp_path):
    rng = np.random.default_rng(0)
    root = str(tmp_path / "mulran")
    os.makedirs(root)
    # per sequence: scans 0-3 in the TRAIN region (spaced 1.5 m so 0/1 and 2/3
    # are 2 m-positives of each other), scans 4-7 inside the TEST geofence
    def positions(offset):
        train = [MULRAN_TRAIN_BASE + offset + [1.5 * i, 0] for i in range(4)]
        test = [MULRAN_TEST_CENTRE + offset + [1.5 * i, 0] for i in range(4)]
        return train + test

    _write_mulran_sequence(root, "Sejong01", positions(np.zeros(2)),
                           1_500_000_000_000_000_000, rng)
    _write_mulran_sequence(root, "Sejong02", positions(np.array([0.5, 0.5])),
                           1_600_000_000_000_000_000, rng)
    return root


def test_mulran_split_and_tuples(mulran_root):
    from egonn_tpu.data.generate_mulran import generate_training_tuples
    from egonn_tpu.data.mulran import MulranSequences

    ds = MulranSequences(mulran_root, ["Sejong01", "Sejong02"], split="train")
    assert len(ds) == 8  # geofence keeps only the 4 train scans per sequence
    tuples = generate_training_tuples(ds, pos_threshold=2, neg_threshold=10,
                                      icp_refine=False)
    assert set(tuples) == set(range(8))
    for ndx, t in tuples.items():
        assert t.id == ndx and t.pose.shape == (4, 4)
        assert ndx not in t.positives
        assert np.all(np.diff(t.positives) > 0) and np.all(np.diff(t.non_negatives) >= 0)
        assert set(t.positives_poses) == set(int(p) for p in t.positives)
        for T in t.positives_poses.values():
            assert T.shape == (4, 4) and np.isfinite(T).all()
    # cross-sequence positives exist (sequences offset by ~0.7 m)
    assert any((t.positives >= 4).any() and (t.positives < 4).any()
               for t in tuples.values())


def test_mulran_icp_refinement_runs(mulran_root):
    from egonn_tpu.data.generate_mulran import generate_training_tuples
    from egonn_tpu.data.mulran import MulranSequences

    ds = MulranSequences(mulran_root, ["Sejong01"], split="train")
    tuples = generate_training_tuples(ds, 2, 10, icp_refine=True)
    t = tuples[0]
    assert len(t.positives) > 0
    for T in t.positives_poses.values():
        assert np.isfinite(T).all()
        # still a rigid transform after refinement
        R = T[:3, :3]
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)


def test_mulran_eval_set_cli(mulran_root, monkeypatch):
    from egonn_tpu.data import generate_mulran

    monkeypatch.setattr(sys, "argv",
                        ["generate_mulran", "--dataset_root", mulran_root,
                         "--eval_sets"])
    generate_mulran.main()
    path = os.path.join(mulran_root, "test_Sejong01_Sejong02.pickle")
    es = EvaluationSet(); es.load(path)
    assert len(es.map_set) == 4  # the 4 geofenced test scans of Sejong01
    assert 0 < len(es.query_set) <= 4
    for e in es.query_set + es.map_set:
        assert e.pose.shape == (4, 4) and e.position.shape == (2,)
        assert os.path.exists(os.path.join(mulran_root, e.rel_scan_filepath))


# ---------------------------------------------------------------------------
# KITTI
# ---------------------------------------------------------------------------


@pytest.fixture()
def kitti_root(tmp_path):
    rng = np.random.default_rng(1)
    root = str(tmp_path / "kitti")
    os.makedirs(os.path.join(root, "sequences", "00", "velodyne"))
    os.makedirs(os.path.join(root, "poses"))
    times, poses = [], []
    # 0-165 s: drive away along x (map); 175-205 s: loop back near the start
    xs = [2.0 * i for i in range(18)] + [3.0, 1.0, 5.0, 500.0]
    for i, x in enumerate(xs):
        times.append(5.0 + 10.0 * i)
        pose = np.eye(4)
        pose[0, 3] = x       # cam x
        pose[2, 3] = 0.0     # cam z (forward)
        poses.append(pose[:3, :4].reshape(-1))
        pc = _ring_cloud(rng)
        pad = np.concatenate([pc, np.zeros((len(pc), 1), np.float32)], 1)
        pad.tofile(os.path.join(root, "sequences", "00", "velodyne",
                                "%06d.bin" % i))
    with open(os.path.join(root, "poses", "00.txt"), "w") as f:
        f.write("\n".join(" ".join(f"{v:.6f}" for v in p) for p in poses) + "\n")
    with open(os.path.join(root, "sequences", "00", "times.txt"), "w") as f:
        f.write("\n".join(f"{t:.6f}" for t in times) + "\n")
    return root


def test_kitti_eval_set(kitti_root, monkeypatch):
    from egonn_tpu.data import generate_kitti

    monkeypatch.setattr(sys, "argv",
                        ["generate_kitti", "--dataset_root", kitti_root])
    generate_kitti.main()
    es = EvaluationSet(); es.load(os.path.join(kitti_root, "kitti_00_eval.pickle"))
    assert len(es.map_set) == 17  # ts 5..165 inside the (0, 170) map window
    # queries: ts 175 (x=34, 2 m from map) + 3 loop-backs; the x=500 one filtered
    assert len(es.query_set) == 4
    for e in es.query_set:
        assert e.position.shape == (2,)
        assert os.path.exists(os.path.join(kitti_root, e.rel_scan_filepath))


# ---------------------------------------------------------------------------
# SouthBay
# ---------------------------------------------------------------------------


def _write_southbay_split(root, split, area, positions, rng, ndx0=0):
    base = os.path.join(root, split, area)
    os.makedirs(os.path.join(base, "pcds"))
    os.makedirs(os.path.join(base, "poses"))
    from egonn_tpu.data.pcd import write_pcd_binary

    rows = []
    for i, (x, y) in enumerate(positions):
        ndx = ndx0 + i
        rows.append(f"{ndx} {100.0 + ndx} {x:.4f} {y:.4f} 0.0 0 0 0 1")
        write_pcd_binary(os.path.join(base, "pcds", f"{ndx}.pcd"),
                         _ring_cloud(rng, n=64, z0=-1.0))
    with open(os.path.join(base, "poses", "gt_poses.txt"), "w") as f:
        f.write("\n".join(rows) + "\n")


@pytest.fixture()
def southbay_root(tmp_path):
    rng = np.random.default_rng(2)
    root = str(tmp_path / "southbay")
    area = "SunnyvaleBigloop"
    # 2 m grid spacing (> 1 m dedup cell); Test/Train near Map for positives
    grid = [(2.0 * i, 0.0) for i in range(6)]
    _write_southbay_split(root, "MapData", area, grid, rng, ndx0=0)
    _write_southbay_split(root, "TestData", area,
                          [(x + 0.6, 0.6) for x, y in grid[:4]] + [(900.0, 0.0)],
                          rng, ndx0=0)
    _write_southbay_split(root, "TrainData", area,
                          [(x + 0.9, -0.7) for x, y in grid], rng, ndx0=0)
    return root


def test_southbay_tuples_and_eval(southbay_root, monkeypatch):
    from egonn_tpu.data import generate_southbay

    monkeypatch.setattr(sys, "argv",
                        ["generate_southbay", "--dataset_root", southbay_root])
    generate_southbay.main()
    train_pickle = os.path.join(southbay_root, "train_southbay_2_10.pickle")
    with open(train_pickle, "rb") as f:
        tuples = pickle.load(f)
    assert len(tuples) > 0
    assert sorted(tuples) == list(range(len(tuples)))  # compacted consecutive ids
    for ndx, t in tuples.items():
        assert t.id == ndx and t.positives_poses is None  # SouthBay: global only
        assert ndx not in t.positives
        assert set(t.positives) <= set(tuples)  # ids remapped into the kept set
        assert np.isfinite(t.pose).all()

    monkeypatch.setattr(sys, "argv",
                        ["generate_southbay", "--dataset_root", southbay_root,
                         "--eval_sets", "--pos_th", "2", "--neg_th", "10"])
    generate_southbay.main()
    es = EvaluationSet()
    es.load(os.path.join(southbay_root, "test_SunnyvaleBigloop_1.0_5.pickle"))
    assert len(es.map_set) == 6
    assert len(es.query_set) == 4  # the 900 m outlier is filtered
    for e in es.query_set:
        assert os.path.exists(os.path.join(southbay_root, e.rel_scan_filepath))
