"""Batched fixed-capacity sparse voxel containers — the TPU-native replacement for
MinkowskiEngine's SparseTensor / coordinate manager.

Layout decision (TPU-first): voxels are stored PER CLOUD as padded, masked buffers
`coords (B, C, 3) int32` + `mask (B, C) bool` + `feats (B, C, F)` instead of ME's flat
concatenation with a batch column.  Consequences:

* all convolutions become batched matmuls (B, C, F) @ (F, F') — ideal MXU shape;
* global pooling / batchnorm / ECA are masked reductions over axis 1, no segment ops;
* kernel maps never cross cloud boundaries by construction;
* every shape is static: capacity overflow drops voxels and is reported via
  `n_unique` per level (see pyramid.py).

Coordinates at pyramid level l are stored in LEVEL UNITS (i.e. already divided by the
tensor stride 2^l).  ME stores absolute coordinates that are multiples of 2^l; convert
with `coords * 2^l` when absolute units are needed (e.g. keypoint decoding, reference
models/minkgl.py:298-302).

Coordinates are stored TRANSPOSED: (B, 3, C) — the large C axis must be a tiled
lane axis on TPU; an int32 (..., C, 3) layout pads 3 -> 128 lanes (42x memory).
See sparse/hashing.py layout note.
"""
from __future__ import annotations

from typing import Optional, Tuple

import flax.struct
import jax.numpy as jnp


@flax.struct.dataclass
class Level:
    """One pyramid level: voxel coordinates plus the gather maps for its convs.

    Index arrays use the convention: value in [0, C_src) is a valid source row,
    value == C_src ("sentinel") gathers a zero row.
    """

    coords: jnp.ndarray                    # (B, 3, C) int32, level units, transposed
    mask: jnp.ndarray                      # (B, C) bool
    n_unique: jnp.ndarray                  # (B,) int32 pre-truncation unique count
    kmap_self: Optional[jnp.ndarray] = None   # (B, K, C) gather into THIS level
    kmap_down: Optional[jnp.ndarray] = None   # (B, 8, C) gather into level l-1
    up_parent: Optional[jnp.ndarray] = None   # (B, C) gather into level l+1
    up_koffset: Optional[jnp.ndarray] = None  # (B, C) int32 in [0, 8) kernel slot
    source_index: Optional[jnp.ndarray] = None  # (B, C) level-0 only: input row of
                                                # each (key-sorted) voxel

    @property
    def capacity(self) -> int:
        return self.coords.shape[2]

    @property
    def batch_size(self) -> int:
        return self.coords.shape[0]

    @property
    def coords_rows(self) -> jnp.ndarray:
        """(B, C, 3) row-layout coordinates (small boundary arrays only)."""
        return jnp.swapaxes(self.coords, 1, 2)


@flax.struct.dataclass
class Pyramid:
    """Coordinate pyramid for one batch: levels[0] is the raw voxel level (stride 1),
    levels[l] has tensor stride 2^l.  Built once per batch by
    egonn_tpu.sparse.pyramid.build_pyramid and shared by trunk + both FPN heads
    (mirrors ME's coordinate-manager reuse, reference models/minkgl.py:46-60)."""

    levels: Tuple[Level, ...]

    def __getitem__(self, i: int) -> Level:
        return self.levels[i]

    @property
    def num_levels(self) -> int:
        return len(self.levels)


@flax.struct.dataclass
class SparseFeats:
    """Features living on one pyramid level."""

    feats: jnp.ndarray  # (B, C, F)
    level: int = flax.struct.field(pytree_node=False)

    @property
    def num_channels(self) -> int:
        return self.feats.shape[-1]


def masked(feats: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Zero out padding rows: feats (B, C, F), mask (B, C)."""
    return feats * mask[..., None].astype(feats.dtype)
