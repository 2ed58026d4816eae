"""Polar / cartesian voxel quantizers — TPU-native equivalents of the reference
`datasets/quantization.py` (jac99/Egonn).

Semantics preserved exactly:

* `PolarQuantizer([step_theta_deg, step_r_m, step_z_m])`:
  theta = 180 + atan2(y, x) * 180/pi in [0, 360); scale each polar coordinate by its
  step; voxel coords = floor(scaled); dedup keeps the first point per voxel
  (reference :29-44).
* `dequantize(coords) = to_cartesian((coords + 0.5) * step)` (reference :55-58).
* `keypoint_position(supervoxel_corner_coords, stride, offset)`:
  centre = (coords + 0.5) * step; kp = centre + offset * (stride * step) / 2;
  then polar->cartesian (reference :60-72).  Note `coords` are ABSOLUTE level-0 voxel
  units (multiples of the stride), exactly as ME's `SparseTensor.C`.
* `CartesianQuantizer(step)` analogous without the polar transform (reference :75-103).

Differences from the reference (by design, TPU-first):

* Fixed capacity + validity mask instead of dynamic shapes: `quantize(pc, mask,
  capacity)` returns padded `(capacity, 3)` int32 voxel coords, a boolean mask, the
  source-point index per kept voxel, and the pre-truncation unique count.
* Pure functions over jnp arrays; batch via vmap.  Float32 throughout.

Negative-coordinate note: voxel index = floor(x / step) (numpy/jnp floor semantics),
matching ME's floored discretization of negative coordinates.
"""
from __future__ import annotations

from typing import List, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from egonn_tpu.ops.geometry import cartesian_to_polar, polar_to_cartesian
from egonn_tpu.sparse.packing import SortedUnique, sorted_unique


class Quantizer:
    """Common API: quantize / dequantize / keypoint_position.

    quantize() returns a key-sorted, deduplicated, fixed-capacity voxel set
    (sparse/packing.py SortedUnique); the kept point per voxel is the FIRST source
    point, matching ME.utils.sparse_quantize semantics."""

    def quantize(self, pc: jnp.ndarray, mask: jnp.ndarray, capacity: int,
                 need_index: bool = True) -> SortedUnique:
        """need_index=False skips the kept-point payload (cheaper single-operand
        sort); the model path never needs it (all-ones features)."""
        raise NotImplementedError

    def __call__(self, pc, mask, capacity, need_index: bool = True):
        return self.quantize(pc, mask, capacity, need_index)

    def dequantize(self, coords: jnp.ndarray) -> jnp.ndarray:
        raise NotImplementedError

    def keypoint_position(self, coords, stride, kp_offset):
        raise NotImplementedError


class PolarQuantizer(Quantizer):
    def __init__(self, quant_step: Sequence[float]):
        assert len(quant_step) == 3, (
            "3 quantization steps expected: sector (degrees), ring and z (meters)"
        )
        self.quant_step = np.asarray(quant_step, dtype=np.float32)
        self.theta_range = int(360.0 // self.quant_step[0])

    def to_polar_voxels(self, pc: jnp.ndarray) -> jnp.ndarray:
        """(N, 3) cartesian -> (3, N) int32 polar voxel coordinates (transposed
        layout; see sparse/hashing.py layout note)."""
        step = self.quant_step
        theta = 180.0 + jnp.arctan2(pc[..., 1], pc[..., 0]) * (180.0 / np.pi)
        dist = jnp.sqrt(pc[..., 0] ** 2 + pc[..., 1] ** 2)
        return jnp.stack(
            [
                jnp.floor(theta / step[0]).astype(jnp.int32),
                jnp.floor(dist / step[1]).astype(jnp.int32),
                jnp.floor(pc[..., 2] / step[2]).astype(jnp.int32),
            ],
            axis=0,
        )

    def quantize(self, pc: jnp.ndarray, mask: jnp.ndarray, capacity: int,
                 need_index: bool = True) -> SortedUnique:
        return sorted_unique(self.to_polar_voxels(pc), mask, capacity,
                             need_index=need_index)

    def dequantize(self, coords: jnp.ndarray) -> jnp.ndarray:
        """coords: (..., 3) voxel coords (row layout — transpose coords_t first)."""
        polar = (coords.astype(jnp.float32) + 0.5) * jnp.asarray(self.quant_step)
        return polar_to_cartesian(polar)

    def keypoint_position(self, coords, stride, kp_offset):
        """coords: (..., 3) int voxel coords in ABSOLUTE level-0 units (multiples of
        stride); stride: int or (3,) supervoxel stride; kp_offset: (..., 3) in (-1, 1).

        Reference datasets/quantization.py:60-72.
        """
        step = jnp.asarray(self.quant_step)
        centres = (coords.astype(jnp.float32) + 0.5) * step
        supervoxel = jnp.asarray(stride, dtype=jnp.float32) * step
        kp = centres + kp_offset * supervoxel / 2.0
        return polar_to_cartesian(kp)


class CartesianQuantizer(Quantizer):
    def __init__(self, quant_step: float):
        self.quant_step = float(quant_step)

    def to_voxels(self, pc: jnp.ndarray) -> jnp.ndarray:
        """(N, 3) -> (3, N) int32 voxel coordinates (transposed layout)."""
        return jnp.floor(pc.T / self.quant_step).astype(jnp.int32)

    def quantize(self, pc: jnp.ndarray, mask: jnp.ndarray, capacity: int,
                 need_index: bool = True) -> SortedUnique:
        return sorted_unique(self.to_voxels(pc), mask, capacity,
                             need_index=need_index)

    def dequantize(self, coords: jnp.ndarray) -> jnp.ndarray:
        return (coords.astype(jnp.float32) + 0.5) * self.quant_step

    def keypoint_position(self, coords, stride, kp_offset):
        centres = (coords.astype(jnp.float32) + 0.5) * self.quant_step
        supervoxel = jnp.asarray(stride, dtype=jnp.float32) * self.quant_step
        if kp_offset is None:
            return centres
        return centres + kp_offset * supervoxel / 2.0


AnyQuantizer = Union[PolarQuantizer, CartesianQuantizer]


# --------------------------------------------------------------------------
# Host-side (numpy) quantization for offline tooling (tuple generation etc.)
# --------------------------------------------------------------------------


def quantize_np(quantizer: AnyQuantizer, pc: np.ndarray):
    """Numpy dedup with identical semantics (first point per voxel, source order).

    Returns (voxel_coords int32 (M, 3), index of kept source points (M,)).
    """
    if isinstance(quantizer, PolarQuantizer):
        theta = 180.0 + np.arctan2(pc[:, 1], pc[:, 0]) * 180.0 / np.pi
        dist = np.sqrt(pc[:, 0] ** 2 + pc[:, 1] ** 2)
        scaled = np.stack([theta, dist, pc[:, 2]], axis=1) / quantizer.quant_step
    else:
        scaled = pc / quantizer.quant_step
    coords = np.floor(scaled).astype(np.int32)
    # first occurrence per unique voxel, in source order
    _, index = np.unique(coords, axis=0, return_index=True)
    index = np.sort(index)
    return coords[index], index
