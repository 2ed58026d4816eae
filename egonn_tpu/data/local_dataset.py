"""6DoF cloud-pair dataset for local-descriptor training.

Parity with reference datasets/mulran/mulran_train.py (jac99/Egonn): anchor +
random positive, ICP-refined relative pose from the tuple pickle, extra random
z-rotation (<= rot_max) + xy-translation (<= trans_max) applied to the positive and
COMPOSED into T_gt (m @ transform, with the reference's [[c, s],[-s, c]] matrix
orientation kept verbatim), both clouds voxel-deduplicated to one point per voxel.

Works for any dataset type whose tuple pickle has positives_poses (MulRan,
synthetic); assembles fixed-size padded LocalBatch buffers for the device.
"""
from __future__ import annotations

from typing import List, Sequence

import numpy as np

from egonn_tpu.data.base import TrainingDataset
from egonn_tpu.data.pipeline import LocalBatch, pad_cloud
from egonn_tpu.ops.quantization import AnyQuantizer, quantize_np


class Training6DOFDataset(TrainingDataset):
    def __init__(self, dataset_path: str, dataset_type: str, query_filename: str,
                 quantizer: AnyQuantizer, rot_max: float = 0.0, trans_max: float = 0.0,
                 rng: np.random.Generator | None = None, **kwargs):
        super().__init__(dataset_path, dataset_type, query_filename, **kwargs)
        self.quantizer = quantizer
        self.rot_max = rot_max
        self.trans_max = trans_max
        self.rng = rng or np.random.default_rng()
        self._epoch: int | None = None
        # anchors usable for pair sampling: need >= 1 positive WITH a relative pose
        self.valid_ids = [
            ndx for ndx, q in self.queries.items()
            if len(q.positives) > 0 and q.positives_poses
        ]

    def set_epoch(self, epoch: int):
        """Make per-item randomness (positive choice, extra rot/trans) a pure
        function of (epoch, item index) — checkpoint resume at an epoch
        boundary then reproduces the uninterrupted run's pair stream exactly
        (train/trainer.py derives all per-epoch randomness this way)."""
        self._epoch = int(epoch)

    def _item_rng(self, ndx) -> np.random.Generator:
        if self._epoch is None:
            return self.rng
        return np.random.default_rng([0, self._epoch, int(ndx)])

    def __getitem__(self, ndx):
        rng = self._item_rng(ndx)
        query_pc, _ = super().__getitem__(ndx)
        positives = self.get_positives(ndx)
        # restrict to positives with a stored relative pose
        positives = [p for p in positives if p in self.queries[ndx].positives_poses]
        assert positives, f"element {ndx} has no positives with relative poses"
        positive_idx = int(rng.choice(positives, 1)[0])
        positive_pc, _ = super().__getitem__(positive_idx)
        transform = self.queries[ndx].positives_poses[positive_idx]

        # Random transform of the positive (reference :42-50, matrix kept verbatim)
        angle = rng.uniform(-self.rot_max, self.rot_max)
        c, s = np.cos(angle), np.sin(angle)
        m = np.eye(4, dtype=np.float32)
        m[:3, :3] = np.array([[c, s, 0.0], [-s, c, 0.0], [0.0, 0.0, 1.0]], np.float32)
        m[:2, 3] = rng.random(2) * 2.0 * self.trans_max - self.trans_max
        positive_pc = positive_pc @ m[:3, :3].T + m[:3, 3]
        transform = m @ transform

        # one point per voxel (reference :53-56)
        _, idx1 = quantize_np(self.quantizer, query_pc)
        _, idx2 = quantize_np(self.quantizer, positive_pc)
        return query_pc[idx1].astype(np.float32), positive_pc[idx2].astype(np.float32), \
            transform.astype(np.float32)


def make_local_batch(dataset: Training6DOFDataset, element_ids: Sequence[int],
                     num_points: int) -> LocalBatch:
    b = len(element_ids)
    anc = np.zeros((b, num_points, 3), np.float32)
    anc_m = np.zeros((b, num_points), bool)
    pos = np.zeros((b, num_points, 3), np.float32)
    pos_m = np.zeros((b, num_points), bool)
    t_gt = np.zeros((b, 4, 4), np.float32)
    for i, ndx in enumerate(element_ids):
        a, p, m = dataset[ndx]
        anc[i], anc_m[i] = pad_cloud(a, num_points)
        pos[i], pos_m[i] = pad_cloud(p, num_points)
        t_gt[i] = m
    return LocalBatch(anc, anc_m, pos, pos_m, t_gt)
