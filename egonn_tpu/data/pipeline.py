"""Input pipeline: host-side batch assembly + device-side preprocessing.

TPU-first design (BASELINE.json north-star: "fuse the hot preprocessing chain —
load, ground-plane removal, cylindrical quantization, augmentation — into
jit-compiled device pipelines"):

* Host side does ONLY file IO: raw scans are padded into fixed (B, N, 3) float32
  buffers with validity masks (ground/zero-point removal already applied by the
  PointCloudLoader at read time, as in the reference).
* Device side (inside the jitted train/eval step): per-element augmentation ->
  whole-batch set transform -> polar/cartesian quantization -> voxel dedup ->
  coordinate pyramid.  One compiled program, no host<->device ping-pong.
* A background prefetch thread overlaps host IO with device compute (the
  reference uses 8 torch DataLoader workers; here IO is the only host work left).

Batch shapes are BUCKETED: the element count B is rounded up to the nearest bucket
(powers of the expansion schedule) and padded with repeats that are masked out of
the loss via the positives/negatives masks, bounding XLA recompilations under
dynamic batch expansion (reference batch 32 -> x1.4 -> ... -> 128).
"""
from __future__ import annotations

import queue
import threading
from dataclasses import dataclass
from typing import Dict, Iterator, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from egonn_tpu.data.augmentation import train_set_transform, train_transform
from egonn_tpu.data.base import TrainingDataset, in_sorted_array
from egonn_tpu.ops.quantization import Quantizer
from egonn_tpu.sparse.pyramid import PyramidSpec, build_pyramid
from egonn_tpu.sparse.types import Pyramid


@dataclass
class GlobalBatch:
    """Host-assembled batch for the global-descriptor loss."""

    clouds: np.ndarray          # (B, N, 3) float32, zero-padded
    point_mask: np.ndarray      # (B, N) bool
    positives_mask: np.ndarray  # (B, B) bool
    negatives_mask: np.ndarray  # (B, B) bool
    valid_elems: np.ndarray     # (B,) bool — False on bucket-padding rows


@dataclass
class LocalBatch:
    """Host-assembled batch of cloud pairs for the local-descriptor loss."""

    anc_clouds: np.ndarray   # (B, N, 3)
    anc_mask: np.ndarray     # (B, N)
    pos_clouds: np.ndarray   # (B, N, 3)
    pos_mask: np.ndarray     # (B, N)
    t_gt: np.ndarray         # (B, 4, 4) float32


# Drop accounting for overlong clouds (mirrors the per-level voxel-overflow
# `Level.n_unique` diagnostics): total clouds truncated / points dropped since
# process start.  Read via pad_cloud_drop_stats(); a one-time warning fires on
# the first truncation so silent subsampling can't go unnoticed.
_DROP_STATS = {"clouds_truncated": 0, "points_dropped": 0, "warned": False}


def pad_cloud_drop_stats() -> dict:
    return dict(_DROP_STATS)


def default_num_points(dataset_type: str) -> int:
    """Per-dataset point budget: KITTI velodyne scans are ~120-130k points before
    ground/zero filtering; MulRan/SouthBay fit in 65536."""
    return 131072 if dataset_type.lower() == "kitti" else 65536


def resolve_num_points(model_params, dataset_type: str) -> int:
    """Config-explicit num_points wins; otherwise the per-dataset default."""
    if getattr(model_params, "num_points_explicit", True):
        return model_params.num_points
    return default_num_points(dataset_type)


def pad_cloud(pc: np.ndarray, n: int) -> tuple[np.ndarray, np.ndarray]:
    """Pad/trim an (M, 3) cloud to (n, 3) + mask.  Overlong clouds are randomly
    subsampled; the RNG is seeded from the cloud's content (not just its length,
    which collides across distinct scans of equal size) so the pattern is
    deterministic per scan.  Truncations are counted in _DROP_STATS."""
    m = len(pc)
    out = np.zeros((n, 3), dtype=np.float32)
    mask = np.zeros((n,), dtype=bool)
    if m > n:
        seed = [m, int(abs(float(pc[0, 0])) * 1e6) % (1 << 31),
                int(abs(float(pc[m // 2, 1])) * 1e6) % (1 << 31)]
        sel = np.random.default_rng(seed).choice(m, n, replace=False)
        out[:] = pc[sel]
        mask[:] = True
        _DROP_STATS["clouds_truncated"] += 1
        _DROP_STATS["points_dropped"] += m - n
        if not _DROP_STATS["warned"]:
            _DROP_STATS["warned"] = True
            print(f"WARNING: cloud with {m} points subsampled to the {n}-point "
                  "budget; raise num_points ([TPU] section) if this is a "
                  "reference dataset envelope (KITTI needs 131072)")
    else:
        out[:m] = pc
        mask[:m] = True
    return out, mask


def round_to_bucket(b: int, buckets: Sequence[int]) -> int:
    for x in buckets:
        if b <= x:
            return x
    return buckets[-1]


def make_global_batch(dataset: TrainingDataset, element_ids: List[int], num_points: int,
                      buckets: Sequence[int]) -> GlobalBatch:
    """Assemble a padded batch + positive/negative masks
    (reference datasets/dataset_utils.py:60-95 collate_fn)."""
    b_real = len(element_ids)
    b = round_to_bucket(b_real, buckets)
    clouds = np.zeros((b, num_points, 3), dtype=np.float32)
    mask = np.zeros((b, num_points), dtype=bool)
    for i, ndx in enumerate(element_ids[:b]):
        pc, _ = dataset[ndx]
        clouds[i], mask[i] = pad_cloud(np.asarray(pc, dtype=np.float32), num_points)

    labels = list(element_ids[:b]) + [-1] * (b - min(b_real, b))
    positives = np.zeros((b, b), dtype=bool)
    negatives = np.zeros((b, b), dtype=bool)
    for i, li in enumerate(labels):
        if li < 0:
            continue
        q = dataset.queries[li]
        for j, lj in enumerate(labels):
            if lj < 0:
                continue
            positives[i, j] = in_sorted_array(lj, q.positives)
            negatives[i, j] = not in_sorted_array(lj, q.non_negatives)
    valid = np.array([l >= 0 for l in labels], dtype=bool)
    return GlobalBatch(clouds, mask, positives, negatives, valid)


def device_preprocess_global(clouds: jnp.ndarray, point_mask: jnp.ndarray,
                             quantizer: Quantizer, spec: PyramidSpec,
                             rng_key: Optional[jax.Array] = None,
                             aug_mode: int = 2) -> Pyramid:
    """Device-side: (augment ->) quantize -> dedup -> pyramid, all inside jit."""
    if rng_key is not None:
        b = clouds.shape[0]
        keys = jax.random.split(jax.random.fold_in(rng_key, 0), b + 1)
        clouds = jax.vmap(lambda k, pc, m: train_transform(k, pc, m, aug_mode))(
            keys[:b], clouds, point_mask
        )
        clouds = train_set_transform(keys[b], clouds, aug_mode)
    res = jax.vmap(lambda pc, m: quantizer.quantize(pc, m, spec.capacities[0], need_index=False))(
        clouds, point_mask
    )
    return build_pyramid(res.coords_t, res.mask, spec, n_unique0=res.n_unique, keys0=res.keys)


class Prefetcher:
    """Background-thread prefetch of host batches (replaces torch DataLoader
    workers — the remaining host work is pure file IO + padding)."""

    def __init__(self, gen_fn, depth: int = 2):
        self._gen_fn = gen_fn
        self._q: queue.Queue = queue.Queue(maxsize=depth)
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._done = object()
        self._thread.start()

    def _worker(self):
        try:
            for item in self._gen_fn():
                self._q.put(item)
        finally:
            self._q.put(self._done)

    def __iter__(self):
        while True:
            item = self._q.get()
            if item is self._done:
                return
            yield item
