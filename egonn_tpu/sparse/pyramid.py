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
based (sparse/packing.py — no colliding scatters).  Kernel maps are built by
the BANDED Pallas kernels (sparse/banded.py) on TPU: z-run presence/rank
kernels for self maps (one compare-all pass per xy column covers all kz
z-offsets), down maps derived by inverting the finer level's up map (a unique
scatter), up maps via the banded lookup kernel; the bucketed gather lookup
(packing.lookup_sorted, ~7 ns/query) remains the portable/fallback engine.
Alternatives measured slower on real hardware: hash tables w/ colliding
scatters (~100x), per-query binary search (12x), dense index grids (30x),
XLA-level z-run window lookups (1.7-2.8x vs bucketed; the Pallas in-VMEM
formulation is what made z-runs win).

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
    MAXKEY,
    PackSpec,
    halve_keys,
    halved_spec,
    compact_kept,
    lookup_sorted,
    pack_keys,
    sorted_unique,
    unpack_keys,
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
    # Whether level 0 records the input-row index of each voxel (tests / raw-cloud
    # dedup need it; the model path does not — saves a sort payload).
    need_source_index: bool = True
    # The stem consumes constant-ones features (EgoNN/MinkLoc feed all-ones
    # 1-channel inputs — reference datasets/dataset_utils.py:80), so its kernel
    # map only needs neighbor PRESENCE.  With this flag the level-0 kmap_self
    # is built by the z-run presence kernel (sparse/banded.py zrun_presence —
    # one reduce per xy-offset column instead of kz lookups) and holds 0 where
    # the neighbor exists / sentinel where not — valid for sparse_conv_ones,
    # NOT for gathering real features.  Leave False for models with real
    # level-0 features (e.g. ResNetBase test configs).
    conv0_ones: bool = False

    @property
    def num_levels(self) -> int:
        return len(self.capacities) - 1

    def pack_at(self, level: int) -> PackSpec:
        sp = self.pack
        for _ in range(level):
            sp = halved_spec(sp)
        return sp


DOWN_OFFSETS = kernel_offsets(2)  # (8, 3): slot = 4*dx + 2*dy + dz


def _xy_offsets(kernel_size: int) -> np.ndarray:
    """(K^2, 2) (dx, dy) offsets in C-order; z is handled as contiguous columns."""
    if kernel_size % 2 == 1:
        r = kernel_size // 2
        rng = range(-r, r + 1)
    else:
        rng = range(0, kernel_size)
    return np.array(list(itertools.product(rng, repeat=2)), dtype=np.int32)


def _kmap_queries(out_coords_t: jnp.ndarray, out_mask: jnp.ndarray,
                  xy_offsets: np.ndarray, kz: int, z_start: int, scale: int,
                  pack: PackSpec) -> jnp.ndarray:
    """Per-cloud query keys for a kernel map: (Kxy*kz, C) int32 packed keys of
    `scale * out_coord + offset`, MAXKEY where out-of-range/padded.  Row order
    is C-order (dx, dy, dz) matching kernel_offsets()."""
    bx, by, bz = pack.bits
    ox, oy, oz = pack.offsets
    kxy = len(xy_offsets)
    c = out_coords_t.shape[1]
    dxs = jnp.asarray(xy_offsets[:, 0])[:, None]  # (Kxy, 1)
    dys = jnp.asarray(xy_offsets[:, 1])[:, None]
    dzs = jnp.arange(z_start, z_start + kz, dtype=jnp.int32)
    x = scale * out_coords_t[0][None, :] + dxs + ox     # (Kxy, C)
    y = scale * out_coords_t[1][None, :] + dys + oy     # (Kxy, C)
    z = (scale * out_coords_t[2] + oz)[None, None, :] + dzs[None, :, None]  # (1,kz,C)
    xyok = (x >= 0) & (x < (1 << bx)) & (y >= 0) & (y < (1 << by))
    zok = (z >= 0) & (z < (1 << bz))
    ok = xyok[:, None, :] & zok & out_mask[None, None, :]
    key = ((x << (by + bz)) | (y << bz))[:, None, :] | z  # (Kxy, kz, C)
    return jnp.where(ok, key, MAXKEY).reshape(kxy * kz, c)


def _use_banded_lookup() -> bool:
    from egonn_tpu.sparse.conv import USE_BANDED, _on_tpu

    return USE_BANDED and _on_tpu()


def _zrun_queries(coords_t: jnp.ndarray, mask: jnp.ndarray,
                  xy_offsets: np.ndarray, kz: int, z_start: int,
                  pack: PackSpec):
    """Per-cloud base queries for the z-run presence kernel: for each xy
    offset, the packed key at the column's LOWEST z slot (clamped into the z
    field), plus the per-voxel realignment shift and valid-bit mask.

    Returns (q_lo (Kxy, C) int32, jshift (C,) int32, top_mask (C,) int32):
    presence of kernel slot s (dz = z_start + s) is bit s of
    `(bits & top_mask) << jshift` where `bits` is the kernel output for q_lo.
    """
    bx, by, bz = pack.bits
    ox, oy, oz = pack.offsets
    dxs = jnp.asarray(xy_offsets[:, 0])[:, None]
    dys = jnp.asarray(xy_offsets[:, 1])[:, None]
    x = coords_t[0][None, :] + dxs + ox                 # (Kxy, C)
    y = coords_t[1][None, :] + dys + oy
    z_base = coords_t[2] + z_start + oz                 # (C,)
    z_clamp = jnp.clip(z_base, 0, (1 << bz) - 1)
    jshift = z_clamp - z_base                           # >= 0
    n_ok = jnp.clip((1 << bz) - z_clamp, 0, kz)         # valid js from z_clamp
    top_mask = (1 << n_ok) - 1
    xyok = (x >= 0) & (x < (1 << bx)) & (y >= 0) & (y < (1 << by))
    key = (x << (by + bz)) | (y << bz) | z_clamp[None, :]
    q_lo = jnp.where(xyok & mask[None, :], key, MAXKEY)
    return q_lo, jshift.astype(jnp.int32), top_mask.astype(jnp.int32)


def _lookup_batched(in_keys: jnp.ndarray, queries: jnp.ndarray) -> jnp.ndarray:
    """(B, C_in) sorted keys x (B, K, C_out) queries -> (B, K, C_out) positions.

    Dispatch: banded Pallas lookup (sparse/banded.py — in-VMEM compare-all over
    128-aligned windows, zero HBM gathers; exact fallback built in) on TPU,
    else the bucketed-gather lookup (packing.lookup_sorted, ~7 ns/query).
    Measured on v5e at the conv0 workload (125 x 16k x 8): 103 ms gather path
    -> 53 ms banded."""
    n_in = in_keys.shape[1]
    # K == 1 (up maps): the banded kernel's per-step overhead dominates at one
    # offset per tile (measured 3.9 ms for all levels vs ~1.5 ms gather path)
    if _use_banded_lookup() and queries.shape[-1] % 128 == 0 \
            and queries.shape[1] > 1:
        from egonn_tpu.sparse.banded import banded_lookup

        pos, _ = banded_lookup(in_keys, queries)
        return pos
    return jax.vmap(lambda sk, q: lookup_sorted(sk, q, sentinel=n_in))(
        in_keys, queries
    )


def _build_kmap(in_keys: jnp.ndarray, out_coords_t: jnp.ndarray, out_mask: jnp.ndarray,
                xy_offsets: np.ndarray, kz: int, z_start: int, scale: int,
                pack: PackSpec) -> jnp.ndarray:
    """Per-cloud gather map: positions in the sorted input key array of
    coordinate scale*o + d (sentinel len(in_keys) when absent/padded).
    Returns (len(xy_offsets) * kz, C) int32.  Used by the vmapped (non-banded)
    pyramid path; the batched TPU path goes through _lookup_batched."""
    key = _kmap_queries(out_coords_t, out_mask, xy_offsets, kz, z_start, scale, pack)
    return lookup_sorted(in_keys, key, sentinel=in_keys.shape[0])


def _dedup_chain_single(coords0_t: jnp.ndarray, mask0: jnp.ndarray, n_unique0,
                        spec: PyramidSpec, keys0: jnp.ndarray | None = None):
    """Per-cloud dedup chain (vmapped): the sorted voxel sets of every level,
    PLUS each level's up-map parent indices as a by-product.

    If keys0 is given, level 0 is taken as already canonical (sorted unique keys
    with MAXKEY padding — exactly a Quantizer.quantize output) and no level-0
    dedup happens.  Otherwise level 0 is re-canonicalized and (when
    spec.need_source_index) source_index maps level-0 rows to input rows.

    Down levels dedup by sorting halve_keys output (halving does not preserve
    order; see packing.halve_keys).  The parent of fine voxel f in the
    compacted level-l table is exactly the unique-ordinal (cumsum rank) of its
    halved key — so up_parent falls out of the dedup sort for free, replacing
    the per-level sorted-table lookups (measured 1.6 ms of bucket row-gathers
    per batch-8 forward) with one extra cheap dual sort per level.
    """
    source_index = jnp.zeros((spec.capacities[0],), jnp.int32)
    if keys0 is not None:
        coords = [coords0_t]
        masks = [mask0]
        keys = [keys0]
    else:
        u0 = sorted_unique(coords0_t, mask0, spec.capacities[0], spec.pack,
                           need_index=spec.need_source_index)
        coords = [u0.coords_t]
        masks = [u0.mask]
        keys = [u0.keys]
        if spec.need_source_index:
            source_index = u0.index
    n_uniques = [jnp.asarray(n_unique0, jnp.int32)]
    up_parents = []  # element i: (cap_i,) parent position of fine level i in
    # level i+1's compacted table (sentinel cap_{i+1})

    # (Round-5 measured dead end, deleted: an "up-map by lookup" engine that
    # derived up_parent by a sorted-table lookup of the halved fine keys in
    # the compacted coarse table — single-operand sort, no inversion sort,
    # bit-identical.  Bench 440.2 vs 479-485 clouds/s: the bucketed lookup's
    # dense boundary counts + row gathers for C_{l-1} queries per level cost
    # more than the dual sort + inversion sort they replaced.)
    for l in range(1, spec.num_levels + 1):
        down_keys = halve_keys(keys[l - 1], spec.pack_at(l - 1))
        cap_l = spec.capacities[l]
        n = down_keys.shape[0]
        fine_pos = jnp.arange(n, dtype=jnp.int32)
        # NOTE: halving does NOT preserve sortedness (collapsing a higher field
        # makes the comparison fall through to lower fields), so a re-sort is
        # needed — dual-operand to carry the fine position for the up map.
        sk, sp = jax.lax.sort((down_keys, fine_pos), num_keys=1,
                              is_stable=False)
        prev = jnp.concatenate([jnp.full((1,), -1, jnp.int32), sk[:-1]])
        is_first = (sk != prev) & (sk != MAXKEY)
        out_keys, _, _ = compact_kept(sk, is_first, cap_l)
        rank = jnp.cumsum(is_first) - 1  # unique ordinal == parent position
        pr = jnp.where((sk != MAXKEY) & (rank < cap_l), rank, cap_l
                       ).astype(jnp.int32)
        # back to fine order: invert the sort permutation with a second sort
        # keyed by sp.  (A unique-indices scatter was A/B'd on chip and LOST,
        # 402 vs 430 clouds/s, round-4 matrix — XLA's scatter lowering beats
        # the sort only at much smaller sizes.  An in-VMEM Pallas bitonic
        # sorter for these sorts also LOST, 411 vs 430.)
        _, up_par = jax.lax.sort((sp, pr), num_keys=1, is_stable=False)
        up_parents.append(up_par)
        out_mask = out_keys != MAXKEY
        pack_l = spec.pack_at(l)
        out_coords = jnp.where(out_mask[None, :],
                               unpack_keys(out_keys, pack_l), 0)
        coords.append(out_coords)
        masks.append(out_mask)
        keys.append(out_keys)
        n_uniques.append(jnp.sum(is_first).astype(jnp.int32))
    return (tuple(coords), tuple(masks), tuple(keys), tuple(n_uniques),
            source_index, tuple(up_parents))


def build_pyramid(coords0_t: jnp.ndarray, mask0: jnp.ndarray, spec: PyramidSpec,
                  n_unique0=None, keys0: jnp.ndarray | None = None) -> Pyramid:
    """Build the batched coordinate pyramid.

    coords0_t: (B, 3, C0) int32 level-0 voxel coords (from a Quantizer),
    mask0 (B, C0).  Inputs need not be sorted or unique — unless keys0 (B, C0)
    is passed (a Quantizer.quantize output), in which case level 0 is trusted
    as canonical and no re-dedup happens.

    Structure: the per-cloud dedup chain is vmapped; kernel maps are built
    BATCHED so the banded Pallas lookup kernel can serve them (pallas_call is
    invoked directly on the (B, ...) arrays — not under vmap)."""
    if n_unique0 is None:
        n_unique0 = jnp.sum(mask0, axis=1).astype(jnp.int32)
    if keys0 is not None:
        coords, masks, keys, n_uniques, src_idx, up_parents = jax.vmap(
            lambda c, m, n, k: _dedup_chain_single(c, m, n, spec, keys0=k)
        )(coords0_t, mask0, n_unique0, keys0)
    else:
        coords, masks, keys, n_uniques, src_idx, up_parents = jax.vmap(
            lambda c, m, n: _dedup_chain_single(c, m, n, spec)
        )(coords0_t, mask0, n_unique0)

    # Up maps come out of the dedup chain for free (the parent of a fine voxel
    # is its halved key's unique-ordinal); each level's down map is then
    # derived by INVERTING the finer level's up map — a unique scatter (child
    # voxels map to distinct (parent, slot) pairs), replacing 8 lookup queries
    # per coarse voxel with one scatter per fine voxel.
    ups = {}
    for l in spec.up_levels:
        assert l + 1 <= spec.num_levels, "up_level must have a parent level"
        parent_q = coords[l] // 2
        kbits = coords[l] - 2 * parent_q  # (B, 3, C) in {0, 1}
        up_koffset = (4 * kbits[:, 0] + 2 * kbits[:, 1] + kbits[:, 2]).astype(jnp.int32)
        ups[l] = (up_parents[l], up_koffset)

    def _invert_up(up_parent, up_koffset, c_coarse, c_fine):
        """(B, C_fine) parent/slot -> (B, 8, C_coarse) down gather map."""
        bsz = up_parent.shape[0]
        fine_idx = jnp.broadcast_to(
            jnp.arange(c_fine, dtype=jnp.int32)[None, :], up_parent.shape
        )
        # Valid fine voxels hit their distinct (slot, parent) cell; invalid ones
        # (parent == sentinel) get DISTINCT out-of-bounds targets so that
        # mode="drop" discards them and the unique_indices contract truly holds
        # (no two rows — valid or dropped — share a target index).
        valid = up_parent < c_coarse
        flat_tgt = jnp.where(
            valid,
            up_koffset * c_coarse + jnp.minimum(up_parent, c_coarse - 1),
            8 * c_coarse + fine_idx,
        )
        init = jnp.full((bsz, 8 * c_coarse), c_fine, jnp.int32)
        out = jax.vmap(
            lambda ini, tgt, val: ini.at[tgt].set(val, mode="drop",
                                                  unique_indices=True)
        )(init, flat_tgt, fine_idx)
        return out.reshape(bsz, 8, c_coarse)

    def _self_kmap_banded(lvl_keys, lvl_coords, lvl_masks, k, pack_l, cl,
                          presence_only):
        """Self k^3 kernel map via the z-run kernels: one banded pass per xy
        column yields all kz z-slots (presence bits; + rank for positions).
        Exact runtime fallback to the full per-key lookup when bands overflow."""
        from egonn_tpu.sparse.banded import zrun_presence, zrun_rank

        b = lvl_coords.shape[0]
        xy = _xy_offsets(k)
        q_lo, jshift, top = jax.vmap(
            lambda c, m: _zrun_queries(c, m, xy, k, -(k // 2), pack_l)
        )(lvl_coords, lvl_masks)
        if presence_only:
            bits, zok = zrun_presence(lvl_keys, q_lo, kz=k)
            rank = None
        else:
            bits, rank, zok = zrun_rank(lvl_keys, q_lo, kz=k)

        def from_bits():
            aligned = (bits & top[:, None, :]) << jshift[:, None, :]
            rows = []
            for s in range(k):
                pres = (aligned >> s) & 1
                if presence_only:
                    pos = jnp.zeros_like(pres)
                else:
                    below = jax.lax.population_count(aligned & ((1 << s) - 1))
                    pos = rank + below
                rows.append(jnp.where(pres > 0, pos, cl))
            return jnp.stack(rows, axis=2).reshape(b, len(xy) * k, cl
                                                   ).astype(jnp.int32)

        def full_lookup():
            q = jax.vmap(
                lambda c, m: _kmap_queries(c, m, xy, k, -(k // 2), 1, pack_l)
            )(lvl_coords, lvl_masks)
            return jax.vmap(
                lambda sk, qq: lookup_sorted(sk, qq, sentinel=cl)
            )(lvl_keys, q)

        from egonn_tpu.sparse.banded import FALLBACK

        if not FALLBACK:
            return from_bits()
        return jax.lax.cond(zok, from_bits, full_lookup)

    levels = []
    for l in range(spec.num_levels + 1):
        pack_l = spec.pack_at(l)
        kmap_self = None
        if (l == 0 or l in spec.self_levels) and _use_banded_lookup() \
                and spec.capacities[l] % 128 == 0:
            k = spec.conv0_kernel_size if l == 0 else spec.block_kernel_size
            kmap_self = _self_kmap_banded(
                keys[l], coords[l], masks[l], k, pack_l, spec.capacities[l],
                presence_only=(l == 0 and spec.conv0_ones),
            )
        elif l == 0 or l in spec.self_levels:
            k = spec.conv0_kernel_size if l == 0 else spec.block_kernel_size
            q = jax.vmap(
                lambda c, m: _kmap_queries(c, m, _xy_offsets(k), k, -(k // 2),
                                           1, pack_l)
            )(coords[l], masks[l])
            kmap_self = _lookup_batched(keys[l], q)

        kmap_down = None
        if l >= 1:
            if (l - 1) in ups:
                kmap_down = _invert_up(*ups[l - 1], spec.capacities[l],
                                       spec.capacities[l - 1])
            else:
                q = jax.vmap(
                    lambda c, m: _kmap_queries(c, m, _xy_offsets(2), 2, 0, 2,
                                               spec.pack_at(l - 1))
                )(coords[l], masks[l])
                kmap_down = _lookup_batched(keys[l - 1], q)

        up_parent, up_koffset = ups.get(l, (None, None))

        levels.append(
            Level(
                coords=coords[l],
                mask=masks[l],
                n_unique=n_uniques[l],
                kmap_self=kmap_self,
                kmap_down=kmap_down,
                up_parent=up_parent,
                up_koffset=up_koffset,
                source_index=(
                    src_idx if l == 0 and keys0 is None and spec.need_source_index
                    else None
                ),
            )
        )
    return Pyramid(levels=tuple(levels))


def capacity_report_traced(pyramid, spec: PyramidSpec) -> dict:
    """Per-level TRUE unique-voxel counts (max over the batch) vs capacity —
    usable inside jit alongside a forward pass.

    Each Level.n_unique counts every unique key the dedup chain saw INCLUDING
    those beyond capacity (sparse/packing.py sorted_unique), so
    n_unique > capacity pinpoints voxel-capacity overflow: the level silently
    dropped (n_unique - capacity) highest-key voxels — the same
    drop-and-report policy as band overflow, and the blind spot this report
    closes (clouds denser than the capacity table would otherwise be
    truncated with no signal; contrast the reference's unbounded
    ME.sparse_quantize, datasets/quantization.py:42).
    Returns {"cap_L{l}": (max_n_unique, capacity)}."""
    return {f"cap_L{l}": (jnp.max(pyramid[l].n_unique), spec.capacities[l])
            for l in range(spec.num_levels + 1)}


def capacity_report(pyramid, spec: PyramidSpec) -> dict:
    """Host-side capacity report: {"cap_L{l}": (n_unique_max, capacity, ok)}."""
    traced = capacity_report_traced(pyramid, spec)
    return {k: (int(n), int(c), bool(int(n) <= int(c)))
            for k, (n, c) in traced.items()}


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
        up_levels=tuple(range(0, num_levels)),  # all: the down-conv backward
        # uses the up map of the finer level (gather-only transpose)
        need_source_index=False,
        conv0_ones=True,  # EgoNN stem consumes all-ones features
    )
