"""Coordinate pyramid construction: the TPU equivalent of MinkowskiEngine's
coordinate manager + kernel-map generation.

For each level l (tensor stride 2^l) we precompute, inside jit with static shapes:

* the voxel coordinate set (downsampled by floor-division by 2 + packed-key sort
  dedup, exactly ME's stride-2 coordinate map: reference models/minkgl.py:104-107
  conv k=2 s=2);
* `kmap_self`: gather indices for stride-1 k^3 convolutions (ResNet blocks, conv0);
* `kmap_down`: gather indices realizing the k=2 s=2 downsampling conv from level l-1;
* `up_parent`/`up_koffset`: the transposed k=2 s=2 conv from level l+1 back onto THIS
  level's coordinates.  ME's ConvolutionTranspose (expand_coordinates=False) lands on
  the coordinate map already registered at the target stride — i.e. the trunk's own
  level-l coordinates (the standard ME UNet/FPN skip pattern; reference
  models/minkgl.py:39-60 adds the lateral 1x1 output, which requires identical
  coordinate sets).  Each fine voxel f has exactly one parent floor(f/2) and kernel
  slot (f0&1, f1&1, f2&1).

Coordinate engine (TPU-fast, measured on v5e): voxel dedup is packed-key sort
based (sparse/packing.py — no colliding scatters); kernel maps are bucketed
compare-all lookups over the sorted keys (packing.lookup_sorted — one contiguous
row-gather per query + dense vectorized compares; binary search and dense index
grids both measured 20-50x slower on TPU).

Kernel offset enumeration order: C-order itertools.product over (dx, dy, dz), dz
fastest — e.g. for k=2: (0,0,0), (0,0,1), (0,1,0), ... (1,1,1), slot = 4*dx+2*dy+dz.
This fixes the kernel-weight layout; checkpoint converters must honor it.

Everything here is per-cloud logic vmapped over the batch.
"""
from __future__ import annotations

import itertools
from dataclasses import dataclass, field
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from egonn_tpu.sparse.packing import (
    DEFAULT_PACK,
    PackSpec,
    lookup_sorted,
    pack_keys,
    sorted_unique,
)
from egonn_tpu.sparse.types import Level, Pyramid


def kernel_offsets(kernel_size: int) -> np.ndarray:
    """(K, 3) int32 offsets. Odd kernels are centered (-k//2..k//2), even kernels
    use [0, k) — matching ME's region semantics for odd/even kernel sizes."""
    if kernel_size % 2 == 1:
        r = kernel_size // 2
        rng = range(-r, r + 1)
    else:
        rng = range(0, kernel_size)
    return np.array(list(itertools.product(rng, repeat=3)), dtype=np.int32)


@dataclass(frozen=True)
class PyramidSpec:
    """Static configuration of the pyramid (defines compiled shapes).

    capacities: per-level voxel capacity, len == num_levels + 1 (level 0 included).
    conv0_kernel_size: kernel of the stride-1 stem conv at level 0.
    block_kernel_size: kernel of the ResNet-block convs (3 in all reference models).
    self_levels: levels needing a k^3 self kernel map (blocks live at levels 1..L;
      level 0 always gets the conv0 map).
    up_levels: levels receiving a transposed conv from level l+1 (FPN top-down).
    pack: packed-key bit budget (sparse/packing.py).
    """

    capacities: Tuple[int, ...]
    conv0_kernel_size: int = 5
    block_kernel_size: int = 3
    self_levels: Tuple[int, ...] = ()
    up_levels: Tuple[int, ...] = ()
    pack: PackSpec = DEFAULT_PACK

    @property
    def num_levels(self) -> int:
        return len(self.capacities) - 1


DOWN_OFFSETS = kernel_offsets(2)  # (8, 3): slot = 4*dx + 2*dy + dz


def _build_kmap(in_keys: jnp.ndarray, out_coords_t: jnp.ndarray, out_mask: jnp.ndarray,
                offsets: np.ndarray, scale: int, pack: PackSpec) -> jnp.ndarray:
    """Gather map: for output voxel o and offset d, the position in the sorted
    input key array holding coordinate scale*o + d (sentinel len(in_keys) when
    absent/padded).

    out_coords_t: (3, C); offsets: (K, 3). Returns (K, C) int32.
    Query tensor is laid out (3, K, C) — large axes last (TPU tiling)."""
    n_in = in_keys.shape[0]
    offsets_t = jnp.asarray(offsets.T)  # (3, K)
    q = scale * out_coords_t[:, None, :] + offsets_t[:, :, None]  # (3, K, C)
    qmask = jnp.broadcast_to(out_mask[None, :], q.shape[1:])
    qkeys = pack_keys(q, qmask, pack)
    return lookup_sorted(in_keys, qkeys, sentinel=n_in)


def _build_pyramid_single(coords0_t: jnp.ndarray, mask0: jnp.ndarray, n_unique0,
                          spec: PyramidSpec) -> Tuple[Level, ...]:
    """Per-cloud pyramid builder (vmapped over batch by build_pyramid).

    Level 0 is re-canonicalized (sorted by packed key, deduped); Level.source_index
    maps each level-0 row back to the input row of coords0_t."""
    conv0_offsets = kernel_offsets(spec.conv0_kernel_size)
    self_offsets = kernel_offsets(spec.block_kernel_size)
    pack = spec.pack

    u0 = sorted_unique(coords0_t, mask0, spec.capacities[0], pack)

    coords = [u0.coords_t]
    masks = [u0.mask]
    keys = [u0.keys]
    n_uniques = [jnp.asarray(n_unique0, jnp.int32)]
    source_index = u0.index

    for l in range(1, spec.num_levels + 1):
        down = coords[l - 1] // 2  # floor division (negatives floor)
        u = sorted_unique(down, masks[l - 1], spec.capacities[l], pack)
        coords.append(u.coords_t)
        masks.append(u.mask)
        keys.append(u.keys)
        n_uniques.append(u.n_unique)

    levels = []
    for l in range(spec.num_levels + 1):
        kmap_self = None
        if l == 0:
            kmap_self = _build_kmap(keys[0], coords[0], masks[0], conv0_offsets, 1, pack)
        elif l in spec.self_levels:
            kmap_self = _build_kmap(keys[l], coords[l], masks[l], self_offsets, 1, pack)

        kmap_down = None
        if l >= 1:
            kmap_down = _build_kmap(keys[l - 1], coords[l], masks[l], DOWN_OFFSETS, 2, pack)

        up_parent = None
        up_koffset = None
        if l in spec.up_levels:
            assert l + 1 <= spec.num_levels, "up_level must have a parent level"
            parent_q = coords[l] // 2
            qkeys = pack_keys(parent_q, masks[l], pack)
            up_parent = lookup_sorted(keys[l + 1], qkeys, sentinel=spec.capacities[l + 1])
            bits = coords[l] - 2 * parent_q  # (3, C) in {0, 1}
            up_koffset = (4 * bits[0] + 2 * bits[1] + bits[2]).astype(jnp.int32)

        levels.append(
            Level(
                coords=coords[l],
                mask=masks[l],
                n_unique=n_uniques[l],
                kmap_self=kmap_self,
                kmap_down=kmap_down,
                up_parent=up_parent,
                up_koffset=up_koffset,
                source_index=source_index if l == 0 else None,
            )
        )
    return tuple(levels)


def build_pyramid(coords0_t: jnp.ndarray, mask0: jnp.ndarray, spec: PyramidSpec,
                  n_unique0=None) -> Pyramid:
    """Build the batched coordinate pyramid.

    coords0_t: (B, 3, C0) int32 level-0 voxel coords (from a Quantizer),
    mask0 (B, C0).  Inputs need not be sorted or unique — level 0 is
    re-canonicalized; Pyramid[0].source_index maps level-0 rows to input rows.
    """
    if n_unique0 is None:
        n_unique0 = jnp.sum(mask0, axis=1).astype(jnp.int32)
    levels = jax.vmap(lambda c, m, n: _build_pyramid_single(c, m, n, spec))(
        coords0_t, mask0, n_unique0
    )
    return Pyramid(levels=levels)


def egonn_pyramid_spec(cap0: int = 16384, num_levels: int = 7,
                       min_out_level: int = 3,
                       decay: Sequence[float] = (1.0, 0.6, 0.4, 0.25, 0.15, 0.1, 0.08, 0.06),
                       ) -> PyramidSpec:
    """Spec matching the published EgoNN architecture (reference
    models/model_factory.py:37-49): 7 stride-2 levels with ResNet blocks at 1..7,
    FPN heads reading levels {3,4} (local) and {5,6,7} (global), so transposed convs
    land on levels 3..6.

    Capacities decay geometrically — LiDAR voxel occupancy shrinks roughly 2-4x per
    level; `decay` can be tuned per dataset. Capacities are rounded up to multiples
    of 128 (TPU lane width).
    """
    caps = []
    for l in range(num_levels + 1):
        c = max(256, int(np.ceil(cap0 * decay[min(l, len(decay) - 1)] / 128)) * 128)
        caps.append(c)
    return PyramidSpec(
        capacities=tuple(caps),
        conv0_kernel_size=5,
        block_kernel_size=3,
        self_levels=tuple(range(1, num_levels + 1)),
        up_levels=tuple(range(min_out_level, num_levels)),
    )
